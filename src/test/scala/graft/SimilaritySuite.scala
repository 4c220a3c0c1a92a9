package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity

class SimilaritySuite extends SparkSuite {
  import spark.implicits._

  def vecs(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  val corpus = vecs(
    0L -> Seq(1f, 0f, 0f),
    1L -> Seq(0.9f, 0.1f, 0f),   // close to 0
    2L -> Seq(0f, 1f, 0f),       // orthogonal to 0
    3L -> Seq(-1f, 0f, 0f),      // opposite of 0
    4L -> Seq(0.95f, 0.05f, 0f)) // closest to 0

  test("cosineTopK exact values and ordering") {
    val got = Similarity.cosineTopK(corpus, corpus.filter($"vec_id" === 0L), 4)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(4L, 1L, 2L, 3L))
    assert(math.abs(got(0).getDouble(2) - 0.95 / math.sqrt(0.95 * 0.95 + 0.05 * 0.05)) < 1e-9)
    assert(got(2).getDouble(2) == 0.0)   // orthogonal
    assert(got(3).getDouble(2) == -1.0)  // opposite, exact with quantized ints
  }

  test("signCell groups by leading-component signs") {
    val cells = Similarity.prepared(corpus, "embedding", "vec_id", bits = 3)
      .orderBy("vec_id").select("cell").collect().map(_.getLong(0))
    // v[0]>=0 -> bit0; v[1]>=0 -> bit1; v[2]>=0 -> bit2 (0 counts as >=0)
    assert(cells.toSeq == Seq(7L, 7L, 7L, 6L, 7L))
  }

  test("lshCosineTopK finds same-cell neighbors, misses cross-cell") {
    val got = Similarity.lshCosineTopK(corpus, corpus.filter($"vec_id" === 0L), 4, bits = 3)
      .orderBy("rank").collect()
    // vec 3 is in cell 6 (negative first component) -> not a candidate
    assert(got.map(_.getLong(1)).toSeq == Seq(4L, 1L, 2L))
  }

  test("lsh top-1 agrees with brute force when neighbor shares the cell") {
    val brute = Similarity.cosineTopK(corpus, corpus.filter($"vec_id" === 0L), 1)
      .first().getLong(1)
    val lsh = Similarity.lshCosineTopK(corpus, corpus.filter($"vec_id" === 0L), 1, bits = 3)
      .first().getLong(1)
    assert(brute == lsh)
  }

  test("top_k aggregate finisher equals the window finisher exactly") {
    val queries = corpus.filter($"vec_id" <= 2L)
    val agg = Similarity.cosineTopK(corpus, queries, 3)
      .orderBy("query_id", "rank").collect().toSeq
    val win = Similarity.cosineTopK(corpus, queries, 3, useWindow = true)
      .orderBy("query_id", "rank").collect().toSeq
    assert(agg == win)
    val aggL = Similarity.lshCosineTopK(corpus, queries, 3, bits = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val winL = Similarity.lshCosineTopK(corpus, queries, 3, bits = 3, useWindow = true)
      .orderBy("query_id", "rank").collect().toSeq
    assert(aggL == winL)
  }

  test("top_k aggregate handles ties, k > group size, and heap overflow order") {
    import graft.functions.TopKFunctions.top_k
    import org.apache.spark.sql.functions._
    // 10 rows, scores with ties; k = 4
    val df = Seq(
      (1L, 5.0, 10L), (1L, 5.0, 9L), (1L, 7.0, 8L), (1L, 1.0, 7L),
      (1L, 7.0, 11L), (1L, 3.0, 1L), (2L, 2.0, 1L)
    ).toDF("g", "score", "id")
    val got = df.groupBy($"g").agg(top_k($"score", $"id", 4).as("top"))
      .orderBy("g").collect()
    val g1 = got(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    // (7.0, 8) before (7.0, 11) — id asc on ties; then 5.0 ids 9, 10
    assert(g1 == Seq((7.0, 8L), (7.0, 11L), (5.0, 9L), (5.0, 10L)))
    val g2 = got(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(g2 == Seq((2.0, 1L))) // k larger than group
  }

  test("nearDupPairs thresholds on exact quantized cosine") {
    val got = Similarity.nearDupPairs(corpus, threshold = 0.99, bits = 3)
      .orderBy("id_a", "id_b").collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._2 == 2L || p._1 == 2L))
  }
}
