package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}

/** Dev probe: dsir_weights / dsir_select cost decomposition (round
  * 14) — where do ~3-5 s go when DuckDB runs the same math in
  * 0.46 s? Pieces timed under the bench session conf, warm reps,
  * medians printed one line each.
  *
  * Finding (sf0.1, idle host): the unigram+bigram feature EXPLODE is
  * ~1.7 s of the total and runs on ONE core — the sf0.1 documents
  * parquet is a single row group, so the scan-fused kernel
  * serializes; everything downstream of it (MD5 bucketing, model
  * agg, score, sort) adds ~0.6 s combined. See the repart variants
  * for the parallelize-the-kernel A/B that motivated
  * featStream's repartition (unlike the round-13 RebalanceProbe
  * cases — lm 0.2 s, text_stats 0.1 s kernels, where the exchange
  * cost more than it bought — this kernel is heavy enough to win).
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("dsir-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("REPS", "3").toInt

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        graft.core.OpCaches.release(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-28s ${ProbeUtil.median(ts)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }

    def docs = graft.Tables.documents(spark, dir)

    def bigramsOf(ws: org.apache.spark.sql.Column) =
      when(size(ws) >= 2,
        transform(sequence(lit(1), size(ws) - 1),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
        .otherwise(array())

    def featuresOf(ws: org.apache.spark.sql.Column) = concat(ws, bigramsOf(ws))

    def featsFrom(src: DataFrame): DataFrame = src
      .select(col("doc_id").as("__id"), explode(featuresOf(
        TextFunctions.tokensNonEmpty(col("text")))).as("f"),
        lit(1).as("w_r"),
        when(col("lang") === "en", 1).otherwise(0).as("w_t"))
      .select(col("__id"),
        (HashFunctions.md5_pair(col("f")).getItem(0) % 8192).as("bucket"),
        col("w_r"), col("w_t"))

    time("floor")(spark.range(1).toDF("x"))
    time("unigrams_only")(docs.select(col("doc_id"), explode(
      TextFunctions.tokensNonEmpty(col("text"))).as("f")))
    time("bigrams_only_lmshape")(docs.select(col("doc_id"), explode(
      bigramsOf(TextFunctions.tokensNonEmpty(col("text")))).as("f")))
    time("explode_nomd5")(docs.select(col("doc_id"), explode(featuresOf(
      TextFunctions.tokensNonEmpty(col("text")))).as("f")))
    time("feats_1task")(featsFrom(docs))
    time("feats_repart32")(featsFrom(docs.repartition(32)))
    time("native_explode_1task")(docs.select(col("doc_id"), explode(
      graft.functions.TokenizeFunctions.ws_ngram_features(col("text"), 2))))
    time("native_ngrams20_1task")(docs.select(col("doc_id"), posexplode(
      graft.functions.TokenizeFunctions.ws_ngrams(col("text"), 20))))
    // round-14 second decomposition: with the native explode at
    // ~0.1 s, where do the remaining seconds of weights_self go?
    def nativeFeats = graft.core.Parallelism.kernelFloor(docs)
      .select(col("doc_id").as("__id"), explode(
        graft.functions.TokenizeFunctions.ws_ngram_features(col("text"), 2)).as("f"),
        lit(1).as("w_r"),
        when(col("lang") === "en", 1).otherwise(0).as("w_t"))
      .select(col("__id"),
        (HashFunctions.md5_pair(col("f")).getItem(0) % 8192).as("bucket"),
        col("w_r"), col("w_t"))
    time("native_feats_md5")(nativeFeats)
    time("nf_cache_populate")({
      val c = nativeFeats.persist()
      c.count()
      c.unpersist(true)
      spark.range(1).toDF("x")
    })
    time("nf_model_agg")(nativeFeats.groupBy(col("bucket"))
      .agg(sum(col("w_r")).as("c_r"), sum(col("w_t")).as("c_t")))
    time("nf_docagg")(nativeFeats.groupBy(col("__id"))
      .agg(count(lit(1)).as("n"), sum(col("bucket")).as("sb")))
    time("weights_self")(graft.operators.Dsir.importanceWeightsSelf(
      docs, col("lang") === "en"))
    time("registered_weights")(graft.SparkEntry.queries("dsir_weights")(spark, dir))
    time("registered_select")(graft.SparkEntry.queries("dsir_select")(spark, dir))
    // select-tail decomposition: where does registered_select's gap
    // over registered_weights go?
    def wSelf = graft.operators.Dsir.importanceWeightsSelf(
      docs, col("lang") === "en")
    time("sel_join_only")(wSelf.join(
      docs.select(col("doc_id"), col("source")), Seq("doc_id")))
    time("sel_scored_head")({
      val sc = graft.core.OpCaches.persistTracked(wSelf.join(
        docs.select(col("doc_id"), col("source")), Seq("doc_id")))
      sc.agg(count(lit(1))).head()
      spark.range(1).toDF("x")
    })
    time("sel_bounded_nosort")({
      val sc = graft.core.OpCaches.persistTracked(wSelf.join(
        docs.select(col("doc_id"), col("source")), Seq("doc_id")))
      graft.operators.Curation.topFractionBounded(
        sc, col("logweight"), Seq("source"), "doc_id", 0.25)
        .select(col("doc_id"), col("source"), col("logweight"))
    })
    // same operator over a synthetic cached frame of the same shape:
    // separates the operator's own cost from the plan-tree overhead
    // of the DSIR subtree it sits on
    time("bounded_on_tiny_cached")({
      val sc = graft.core.OpCaches.persistTracked(
        spark.range(50000).select(col("id").as("doc_id"),
          concat(lit("s"), pmod(col("id"), lit(5))).as("source"),
          pmod(col("id") * 2654435761L, lit(100000)).cast("double").as("logweight")))
      sc.agg(count(lit(1))).head()
      graft.operators.Curation.topFractionBounded(
        sc, col("logweight"), Seq("source"), "doc_id", 0.25)
        .select(col("doc_id"), col("source"), col("logweight"))
    })
    spark.stop()
  }
}
