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

  test("nearDupPairs thresholds on exact quantized cosine") {
    val got = Similarity.nearDupPairs(corpus, threshold = 0.99, bits = 3)
      .orderBy("id_a", "id_b").collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._2 == 2L || p._1 == 2L))
  }
}
