package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Retrieval, Sampling}
import graft.functions.TextFunctions

/** BM25 retrieval, token-budget curation, and weighted sampling. */
class RetrievalSuite extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple apple banana"),
    (2L, "apple banana banana"),
    (3L, "cherry cherry cherry"),
    (4L, "apple")).toDF("doc_id", "text")

  test("bm25: shorter doc with equal tf outranks longer; tf raises score") {
    // df(apple)=3, N=4, avgdl=2.5 — hand-checked: tfnorm(d4: tf1,dl1)
    // = 2.2/1.66 > tfnorm(d1: tf2,dl3) = 4.4/3.38 > tfnorm(d2: tf1,dl3)
    val q = Seq((1L, "apple")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(corpus, q, k = 10)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(4L, 1L, 2L))
    // scores strictly descending, rank 1-based contiguous
    val scores = got.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a > b })
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
  }

  test("bm25: rarer term carries more idf; absent query terms contribute nothing") {
    // banana df=2 < apple df=3, so d2 (apple+banana²) outranks d1
    // (apple²+banana): the doc heavy in the RARER term wins
    val q = Seq((2L, "apple"), (2L, "banana"), (2L, "nosuchterm"))
      .toDF("query_id", "term")
    val got = Retrieval.bm25TopK(corpus, q, k = 10)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(2L, 1L, 4L))
    assert(got(0).getDouble(3) > got(1).getDouble(3))
  }

  test("bm25: identical docs tie and break by doc_id ascending") {
    val twins = Seq((7L, "pear plum"), (3L, "pear plum"), (9L, "plum only"))
      .toDF("doc_id", "text")
    val q = Seq((1L, "pear")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(twins, q, k = 10).orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(3L, 7L))
    assert(got(0).getDouble(3) == got(1).getDouble(3))
  }

  test("bm25: corpus-absent query yields no rows; doc without query terms never appears") {
    val q = Seq((9L, "zzz")).toDF("query_id", "term")
    assert(Retrieval.bm25TopK(corpus, q, k = 10).count() == 0)
  }

  test("tokenBudget keeps best-first rows while the inclusive cumsum fits") {
    val docs = Seq(
      (1L, "g", 5.0, 4L), (2L, "g", 4.0, 3L), (3L, "g", 3.0, 2L))
      .toDF("doc_id", "grp", "score", "tok")
    val got = Curation.tokenBudget(docs, col("score"), col("tok"),
      Seq("grp"), "doc_id", budget = 7L)
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(4))).toSeq ==
      Seq((1L, 4L), (2L, 7L)))
  }

  test("tokenBudget: an oversized best row consumes the budget (cap, not knapsack)") {
    val docs = Seq((1L, "g", 9.0, 10L), (2L, "g", 8.0, 3L))
      .toDF("doc_id", "grp", "score", "tok")
    // row 1 (cum 10) overflows and row 2's cum (13) includes it —
    // the budget is a prefix cap on the quality-ranked walk
    assert(Curation.tokenBudget(docs, col("score"), col("tok"),
      Seq("grp"), "doc_id", budget = 7L).count() == 0)
  }

  test("packSequences: hand case — straddling docs split exactly across bins") {
    val docs = Seq((1L, "g", 3L), (2L, "g", 4L), (3L, "g", 2L))
      .toDF("doc_id", "grp", "tok")
    val got = graft.operators.Packing.packSequences(
      docs, col("tok"), Seq("grp"), "doc_id", seqLen = 4L)
      .orderBy("doc_id", "bin_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 3L),            // doc1: all 3 tokens in bin 0
      (2L, 0L, 1L), (2L, 1L, 3L), // doc2 straddles bins 0/1
      (3L, 1L, 1L), (3L, 2L, 1L))) // doc3 straddles bins 1/2
  }

  test("packSequences: per-doc token totals conserved; interior bins exactly full") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val packed = graft.operators.Packing.packSequences(
      docs, TextFunctions.tokenCount(col("text")), Seq("lang"), "doc_id", 512L)
    val perDoc = packed.groupBy("doc_id").agg(sum("tok_in_bin").as("t"))
    val want = docs.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .filter(col("n") > 0)
    assert(perDoc.join(want, "doc_id").filter(col("t") =!= col("n")).count() == 0)
    val perBin = packed.groupBy("lang", "bin_id").agg(sum("tok_in_bin").as("t"))
    val lastBin = packed.groupBy("lang").agg(max("bin_id").as("bin_id"))
    assert(perBin.join(lastBin, Seq("lang", "bin_id"), "left_anti")
      .filter(col("t") =!= 512L).count() == 0,
      "every non-final bin must hold exactly seqLen tokens")
  }

  test("packSequencesGlobal: two-phase cumsum equals the window form at any partition count") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val toks = TextFunctions.tokenCount(col("text"))
    // single-stratum window form = the global reference
    val ref = graft.operators.Packing.packSequences(
      docs.withColumn("one", lit(1)), toks, Seq("one"), "doc_id", 512L)
      .select("doc_id", "bin_id", "tok_in_bin")
      .collect().map(_.toSeq).toSet
    for (p <- Seq(3, 7)) {
      val got = graft.operators.Packing.packSequencesGlobal(
        docs, toks, "doc_id", 512L, numPartitions = p)
        .collect().map(_.toSeq).toSet
      assert(got == ref, s"two-phase cumsum diverged at $p partitions")
    }
  }

  test("weightedSample: clamped edges and nesting in the weight") {
    val docs = (0L until 500L).map(d => (d, d)).toDF("doc_id", "v")
    assert(Sampling.weightedSample(docs, "doc_id", lit(1.5)).count() == 500)
    assert(Sampling.weightedSample(docs, "doc_id", lit(-0.5)).count() == 0)
    val lo = Sampling.weightedSample(docs, "doc_id", lit(0.3))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hi = Sampling.weightedSample(docs, "doc_id", lit(0.7))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), "same salt: lower weight must nest in higher")
    assert(lo.nonEmpty && hi.size < 500)
  }

  test("weightedSample at constant weight equals bernoulliSample at that fraction") {
    val docs = (0L until 300L).map(d => (d, d)).toDF("doc_id", "v")
    val w = Sampling.weightedSample(docs, "doc_id", lit(0.25))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulliSample(docs, "doc_id", 0.25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(w == b)
  }
}
