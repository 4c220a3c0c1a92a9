package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: dup_spans / dup_stats sf0.1 floor decomposition (r20,
  * VERDICT r19 ask #4 — the two substring rows idle at ~0.95/1.03 s
  * against 0.28/0.40 s oracles while crossing to 0.43x/0.30x at
  * 100x). Same method as LmProbe (r13/r14): cumulative plan
  * prefixes, warm reps under the bench session conf, medians, then
  * the structural alternatives.
  *
  * Stages probed (all materialized with the bench's noop write):
  *   floor     one-row action (job-round floor)
  *   keys      windowKeys kernel: tokenize + 96-bit window keys
  *   dupkeys   + the (h1,h2) groupBy count >= 2 reduction
  *   marked    + the left-semi probe back onto the window stream
  *   spans     + the per-doc interval merge (two analytic windows)
  *   spans_srt + the registered probed-bounds output sort
  *   stats     the registered dup_stats (spans -> per-doc sum ->
  *             n_tokens join -> sort)
  *
  * Alternatives A/B'd:
  *   stats_direct  dup_stats WITHOUT materializing maximal spans:
  *                 covered-token count per doc from the running-max
  *                 merge directly — one pass over dw with the same
  *                 analytic window but no gid pass and no second
  *                 groupBy. Measured 1.16 → 1.05 s interleaved,
  *                 output-equivalent (set-equality check below) —
  *                 ADOPTED as [[SubstringDedup.duplicationStats]]'s
  *                 implementation in r20, so on current code `stats`
  *                 and `stats_drct` measure the same shape and this
  *                 probe's historical value is the pre-adoption A/B
  *                 plus the floor decomposition in SCALING.md.
  */
object DupSpansFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("dupspans-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val w = 20

    def docs = graft.Tables.documents(spark, dir)

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (0 to reps).map { i =>
        graft.core.OpCaches.release()
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.drop(1) // warm pass
      println(f"$name%-12s median ${ProbeUtil.median(ts)}%.3f s " +
        ts.map(t => f"$t%.3f").mkString("[", " ", "]"))
    }

    import graft.operators.SubstringDedup
    def keys = SubstringDedup.windowKeys(docs, w, "doc_id", "text")
    def dupKeys = keys.groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") >= 2)
      .select(col("h1"), col("h2"))
    def dw = keys.join(dupKeys, Seq("h1", "h2"), "left_semi")
      .select(col("doc_id"), col("s"),
        (col("s") + lit(w.toLong) - 1L).as("e"))

    time("floor")(spark.range(1).toDF("x"))
    time("keys")(keys)
    time("dupkeys")(dupKeys)
    time("marked")(dw)
    time("spans")(SubstringDedup.duplicateSpans(docs, w))
    time("spans_srt")(graft.core.StaticRange.denseIdSort(
      SubstringDedup.duplicateSpans(docs, w), docs, "doc_id",
      Seq(col("doc_id").asc, col("span_start").asc)))
    time("stats")(graft.core.StaticRange.denseIdSort(
      SubstringDedup.duplicationStats(docs, w), docs, "doc_id",
      Seq(col("doc_id").asc)))

    // stats_direct: per-doc covered tokens in ONE pass over dw — the
    // interval merge's running max gives each window's NEW coverage
    // as e - max(s - 1, prevMax), clamped at 0; summing it per doc
    // equals summing merged span lengths, skipping the gid window +
    // spans groupBy entirely
    def statsDirect = {
      val byDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("s"))
      val prevMax = max(col("e"))
        .over(byDoc.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1))
      val cover = dw.select(col("doc_id"),
        greatest(col("e") - greatest(col("s") - 1L, coalesce(prevMax,
          lit(0L))), lit(0L)).as("nc"))
        .groupBy(col("doc_id")).agg(sum(col("nc")).as("dup_tokens"))
      docs.select(col("doc_id"),
          graft.functions.TokenizeFunctions.ws_token_count(col("text"))
            .cast("long").as("n_tokens"))
        .filter(col("n_tokens") >= w)
        .join(cover, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("dup_tokens"),
          (col("dup_tokens").cast("double") / col("n_tokens")).as("dup_ratio"))
    }
    time("stats_drct")(graft.core.StaticRange.denseIdSort(
      statsDirect, docs, "doc_id", Seq(col("doc_id").asc)))
    // equivalence check (order-insensitive)
    val a = graft.operators.SubstringDedup.duplicationStats(docs, w)
      .collect().map(_.toSeq).toSet
    val b = statsDirect.collect().map(_.toSeq).toSet
    println(s"stats_direct equivalent: ${a == b} (${a.size} rows)")
    spark.stop()
  }
}
