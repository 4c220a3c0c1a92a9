package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev probe: persist+orderBy (sampling sort over a cached frame) vs
  * denseIdSort (probed-bounds pass-through, no persist) for the four
  * round-14 heavy rows — interleaved rounds so both variants share
  * ambient conditions; cross-run medians proved unusable (the probe
  * itself leaves a load-average tail).
  */
object SortShapeProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("sort-shape-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("REPS", "5").toInt
    def docs = Tables.documents(spark, dir)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "dup_spans_persist_sort" -> (() =>
        graft.core.OpCaches.persistTracked(
          graft.operators.SubstringDedup.duplicateSpans(docs, 20))
          .orderBy("doc_id", "span_start")),
      "dup_spans_dense_sort" -> (() =>
        graft.core.StaticRange.denseIdSort(
          graft.operators.SubstringDedup.duplicateSpans(docs, 20),
          docs, "doc_id", Seq(col("doc_id").asc, col("span_start").asc))),
      "dup_stats_persist_sort" -> (() =>
        graft.core.OpCaches.persistTracked(
          graft.operators.SubstringDedup.duplicationStats(docs, 20))
          .orderBy("doc_id")),
      "dup_stats_dense_sort" -> (() =>
        graft.core.StaticRange.denseIdSort(
          graft.operators.SubstringDedup.duplicationStats(docs, 20),
          docs, "doc_id", Seq(col("doc_id").asc))),
      "dsir_w_persist_sort" -> (() =>
        graft.core.OpCaches.persistTracked(
          graft.operators.Dsir.importanceWeightsSelf(docs, col("lang") === "en"))
          .orderBy("doc_id")),
      "dsir_w_dense_sort" -> (() =>
        graft.core.StaticRange.denseIdSort(
          graft.operators.Dsir.importanceWeightsSelf(docs, col("lang") === "en"),
          docs, "doc_id", Seq(col("doc_id").asc))),
      "dsir_sel_join_persist" -> (() => {
        val w = graft.operators.Dsir.importanceWeightsSelf(
          docs, col("lang") === "en")
        val scored = graft.core.OpCaches.persistTracked(
          w.join(docs.select(col("doc_id"), col("source")), Seq("doc_id")))
        graft.core.OpCaches.persistTracked(
          graft.operators.Curation.topFractionBounded(
            scored, col("logweight"), Seq("source"), "doc_id", 0.25)
            .select(col("doc_id"), col("source"), col("logweight")))
          .orderBy("doc_id")
      }),
      "dsir_sel_extras_dense" -> (() => {
        val scored = graft.core.OpCaches.persistTracked(
          graft.operators.Dsir.importanceWeightsSelf(
            docs, col("lang") === "en", extraCols = Seq("source"))
            .select(col("doc_id"), col("source"), col("logweight")))
        graft.core.StaticRange.denseIdSort(
          graft.operators.Curation.topFractionBounded(
            scored, col("logweight"), Seq("source"), "doc_id", 0.25),
          docs, "doc_id", Seq(col("doc_id").asc))
      }),
      "dsir_sel_dense_noaqe" -> (() => {
        val s2 = graft.core.SessionTuning.boundedPlan(spark)
        val d2 = Tables.documents(s2, dir)
        val scored = graft.core.OpCaches.persistTracked(
          graft.operators.Dsir.importanceWeightsSelf(
            d2, col("lang") === "en", extraCols = Seq("source"))
            .select(col("doc_id"), col("source"), col("logweight")))
        graft.core.StaticRange.denseIdSort(
          graft.operators.Curation.topFractionBounded(
            scored, col("logweight"), Seq("source"), "doc_id", 0.25),
          d2, "doc_id", Seq(col("doc_id").asc))
      }),
      "dsir_w_dense_noaqe" -> (() => {
        val s2 = graft.core.SessionTuning.boundedPlan(spark)
        val d2 = Tables.documents(s2, dir)
        graft.core.StaticRange.denseIdSort(
          graft.operators.Dsir.importanceWeightsSelf(d2, col("lang") === "en"),
          d2, "doc_id", Seq(col("doc_id").asc))
      }),
      "dup_spans_dense_noaqe" -> (() => {
        val s2 = graft.core.SessionTuning.boundedPlan(spark)
        val d2 = Tables.documents(s2, dir)
        graft.core.StaticRange.denseIdSort(
          graft.operators.SubstringDedup.duplicateSpans(d2, 20),
          d2, "doc_id", Seq(col("doc_id").asc, col("span_start").asc))
      }),
      // r14c: row-local fold scoring (the registered form) vs the
      // explode+hash-agg scoring over the same literal model — is the
      // interpreted HigherOrderFunction fold cheaper than the
      // codegen'd explode + exchange + agg it replaced?
      "dsir_w_rowlocal" -> (() =>
        graft.core.StaticRange.denseIdSort(
          graft.operators.Dsir.importanceWeightsSelf(docs, col("lang") === "en"),
          docs, "doc_id", Seq(col("doc_id").asc))),
      "dsir_w_explode" -> (() => {
        val qArr = graft.operators.Dsir.modelArraySelf(docs, col("lang") === "en")
        val scored = graft.core.Parallelism.kernelFloor(docs)
          .select(col("doc_id"), explode(
            graft.functions.TokenizeFunctions.ws_ngram_features(col("text"), 2)).as("f"))
          .select(col("doc_id"), element_at(typedLit(qArr.toSeq),
            (graft.functions.HashFunctions.md5_pair(col("f")).getItem(0) % 8192
              + lit(1L)).cast("int")).as("q"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_feats"), sum(col("q")).as("qsum"))
          .select(col("doc_id"), col("n_feats"),
            (col("qsum").cast("double") / lit(1e9)).as("logweight"))
        graft.core.StaticRange.denseIdSort(scored, docs, "doc_id",
          Seq(col("doc_id").asc))
      }),
      // r14b: the DSIR cache inversion applied to the window stream —
      // recompute the wins kernel per consumer instead of the eager
      // persist (kernel ~0.1 s at sf0.1, materialize ~0.36 s; the two
      // consumer exchanges run CONCURRENTLY under AQE so the second
      // kernel pass overlaps the first)
      "dup_spans_nopersist" -> (() =>
        graft.core.StaticRange.denseIdSort(
          graft.operators.SubstringDedup.duplicateSpansShape(
            docs, 20, "doc_id", "text", persistWins = false),
          docs, "doc_id", Seq(col("doc_id").asc, col("span_start").asc))),
      "dup_stats_nopersist" -> (() =>
        graft.core.StaticRange.denseIdSort(
          graft.operators.SubstringDedup.duplicationStatsShape(
            docs, 20, "doc_id", "text", persistWins = false),
          docs, "doc_id", Seq(col("doc_id").asc))))

    // phase timing of the dense-sort select: where does its gap over
    // the weights row go?
    if (sys.env.get("PROBE_PHASES").contains("1")) {
      for (r <- 1 to 3) {
        graft.core.OpCaches.release(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val scored = graft.core.OpCaches.persistTracked(
          graft.operators.Dsir.importanceWeightsSelf(
            docs, col("lang") === "en", extraCols = Seq("source"))
            .select(col("doc_id"), col("source"), col("logweight")))
        scored.count()
        val t1 = System.nanoTime()
        val bounded = graft.operators.Curation.topFractionBounded(
          scored, col("logweight"), Seq("source"), "doc_id", 0.25)
        val t2 = System.nanoTime()
        val sorted = graft.core.StaticRange.denseIdSort(
          bounded, docs, "doc_id", Seq(col("doc_id").asc))
        val t3 = System.nanoTime()
        sorted.write.format("noop").mode("overwrite").save()
        val t4 = System.nanoTime()
        println(f"PHASES r$r populate=${(t1 - t0) / 1e9}%.2f boundedCtor=${(t2 - t1) / 1e9}%.2f sortCtor=${(t3 - t2) / 1e9}%.2f write=${(t4 - t3) / 1e9}%.2f")
      }
    }

    // VARIANTS=name1,name2 interleaves just that subset
    val onlyV = sys.env.get("VARIANTS").map(_.split(",").map(_.trim).toSet)
    val chosen = variants.filter { case (n, _) => onlyV.forall(_.contains(n)) }
    val times = collection.mutable.Map[String, Vector[Double]]()
    for (r <- 0 to rounds; (n, mk) <- chosen) {
      graft.core.OpCaches.release(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      if (r > 0) times(n) = times.getOrElse(n, Vector.empty) :+ t
    }
    chosen.foreach { case (n, _) =>
      val ts = times(n)
      println(f"PROBE $n%-26s med=${ProbeUtil.median(ts)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
