package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dev probe: lm_perplexity cost decomposition and every structural
  * alternative tried against it, interleaved under the bench session
  * conf (round 13). Backs SCALING.md's round-13 "floor-bound rows"
  * section.
  *
  * Measured (sf0.1, warm reps, idle host):
  *
  *  - decomposition: action floor 0.03 s; single-row-group corpus
  *    tokenize + bigram explode alone 0.22 s (ONE task — the sf0.1
  *    documents parquet is one 1.5 MB row group); + per-doc agg
  *    0.28 s; + broadcast model join 0.36 s; model build alone
  *    0.33 s; registered end-to-end 0.7–1.0 s. The build and score
  *    overlap barely at all (sum ≈ observed), because the score
  *    stage cannot start before its broadcast inputs materialize.
  *  - q_premodel (quantize log once per model entry, not per corpus
  *    occurrence): equal within noise — the per-occurrence log was
  *    never the cost.
  *  - in_row (model as ONE map_from_entries row + per-doc
  *    aggregate() lambda, no explode/join/groupBy): 16 s,
  *    catastrophic — Catalyst's GetMapValue probes ArrayBasedMapData
  *    LINEARLY, so 300k probes x 40k entries is O(n*|map|). Map-type
  *    lookup only works for small maps (the vocab_encode map is why
  *    that row survives it).
  *  - fused model build (one slice tokenize emitting kind-tagged
  *    unigram AND bigram events, split above a shared exchange):
  *    equal within noise — the doubled explode width and the
  *    persist's two downstream scans give back what the saved
  *    tokenize pass gains.
  *  - score-side scan rebalance (repartition 32) and
  *    StaticRange.sortByKnownDomain instead of orderBy: each within
  *    noise (the tokenize task is 0.22 s; the shuffle round + AQE
  *    stage it adds costs about the same).
  *  - AQE-off child session (lm AND bm25): consistently WORSE
  *    (+0.3–0.5 s) — AQE's partition coalescing is what keeps the
  *    32-partition exchanges cheap at toy scale; the per-exchange
  *    re-plan round it charges is smaller than the task-scheduling
  *    it saves. Kept ON for every text row (the ANN family differs:
  *    its plans are all explicit broadcasts + bounded top-k, nothing
  *    for AQE to re-plan, so its child session stays off).
  *
  * Conclusion recorded in SCALING.md: lm_perplexity (and bm25_topk)
  * are fixed-structure-bound at toy scale — serialized
  * build-model-then-score job rounds over a one-row-group scan —
  * and every structural alternative measures equal or worse. The
  * shape is the right one at 100 TB (bounded broadcast model, one
  * corpus pass, map-side partial agg); the toy-scale gap to DuckDB
  * is job-round latency, not work.
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("lm-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run(mk: => DataFrame): Double = {
      graft.core.OpCaches.release(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def bigramsOf(ws: org.apache.spark.sql.Column) =
      when(size(ws) >= 2,
        transform(sequence(lit(1), size(ws) - 1),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
        .otherwise(array())

    def docs = graft.Tables.documents(spark, dir)
    def registered = graft.SparkEntry.queries("lm_perplexity")(spark, dir)

    // piecewise: model-build alone, then score alone against a
    // pre-materialized driver-local model (upper bound on what a
    // ready-model serving path could reach)
    def modelOnly: DataFrame = {
      val (lm, vocabDf) = graft.operators.Lm.bigramLmPlan(
        docs.filter(col("doc_id") % 7 === 3))
      lm.crossJoin(broadcast(vocabDf))
    }
    lazy val localModel: (DataFrame, Long) = {
      val (lm, vocabDf) = graft.operators.Lm.bigramLmPlan(
        docs.filter(col("doc_id") % 7 === 3))
      val rows = lm.collect()
      val v = vocabDf.collect()(0).getLong(0)
      val local = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), lm.schema)
      (local, v)
    }
    def scoreOnly: DataFrame = {
      val (local, v) = localModel
      graft.operators.Lm.lmScore(docs, local, v).orderBy("doc_id")
    }

    // incremental decomposition of the SCORE side; `floor0` controls
    // the per-action session overhead
    def floor0: DataFrame = spark.range(1).toDF("x")
    def expl: DataFrame = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ws"))
      .select(col("doc_id"), explode(bigramsOf(col("ws"))).as("s"))
    def explAgg: DataFrame = expl.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))

    // fused model build: ONE tokenize pass over the reference slice
    // emits unigram AND bigram events (kind-tagged), one combined
    // aggregate, then uni/lm split above the shared exchange —
    // removes the second slice tokenize and the uni cache race.
    // Measured equal within noise; kept for re-measurement.
    def fusedModel: (DataFrame, DataFrame) = {
      val ref = docs.filter(col("doc_id") % 7 === 3)
        .filter(length(btrim(col("text"))) > 0)
      val events = ref
        .select(TextFunctions.tokens(col("text")).as("ws"))
        .select(explode(concat(
          transform(col("ws"), t => struct(lit(0).as("kind"), t.as("key"))),
          transform(bigramsOf(col("ws")),
            s => struct(lit(1).as("kind"), s.as("key"))))).as("e"))
        .groupBy(col("e.kind").as("kind"), col("e.key").as("key"))
        .agg(count(lit(1)).as("c"))
        .transform(graft.core.OpCaches.persistTracked)
      val uni = events.filter(col("kind") === 0)
        .select(col("key").as("a"), col("c").as("c_a"))
      val lm = events.filter(col("kind") === 1)
        .select(col("key").as("s"), col("c").as("c_ab"))
        .orderBy(col("c_ab").desc, col("s").asc).limit(50000)
        .withColumn("a", split(col("s"), " ").getItem(0))
        .join(uni, Seq("a"))
        .select(col("s"), col("c_ab"), col("c_a"))
      val vocabDf = uni.agg(count(lit(1)).cast("long").as("__v0"))
        .select(when(col("__v0") > lit(0L), col("__v0"))
          .otherwise(raise_error(lit("empty reference vocabulary")).cast("long"))
          .as("__vocab"))
      (lm, vocabDf)
    }
    def fusedFull: DataFrame = {
      val (lm, vocabDf) = fusedModel
      graft.operators.Lm.lmScoreWith(docs, lm, vocabDf).orderBy("doc_id")
    }

    // AQE-off child session: does dropping the per-exchange
    // query-stage round pay on the multi-exchange lm/bm25 rows?
    // (Answer: no — consistently worse, see scaladoc.)
    val off = graft.core.SessionTuning.boundedPlan(spark)
    def lmOff = graft.SparkEntry.queries("lm_perplexity")(off, dir)
    def bm25On = graft.SparkEntry.queries("bm25_topk")(spark, dir)
    def bm25Off = graft.SparkEntry.queries("bm25_topk")(off, dir)

    for (rep <- 1 to 4) {
      println(f"registered     ${run(registered)}%.2f")
      println(f"model_only     ${run(modelOnly)}%.2f")
      println(f"score_only     ${run(scoreOnly)}%.2f")
      println(f"floor0         ${run(floor0)}%.2f")
      println(f"expl           ${run(expl)}%.2f")
      println(f"expl_agg       ${run(explAgg)}%.2f")
      println(f"fused          ${run(fusedFull)}%.2f")
      println(f"lm_aqe_off     ${run(lmOff)}%.2f")
      println(f"bm25_on        ${run(bm25On)}%.2f")
      println(f"bm25_off       ${run(bm25Off)}%.2f")
    }
    // sanity: the fused variant's output equals the registered row's
    val a = registered.collect().map(_.toSeq).toSeq
    val c = fusedFull.collect().map(_.toSeq).toSeq
    println(s"EQUAL fused=${a == c}")
    spark.stop()
  }
}
