package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Chunking, Curation, Dedup, Sampling}

/** Dev probe (r15): curation_pipeline composition shapes — gate
  * semi-join vs (historically) an in-place filter, window vs
  * groupBy-min dedup, floored vs raw gate walk, persisted vs
  * recomputed gate. Interleaved; rep 0 discarded. The in-place
  * filter variants were removed with Curation.gopherKeep itself: an
  * inlined gate predicate re-runs the profile kernel per reference
  * (see gopherGate's scaladoc), so the filter shape is a trap, not
  * an option.
  */
object CurationPipeProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("curation-pipe-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("REPS", "5").toInt
    def docs = Tables.documents(spark, dir)

    def downstream(exact: DataFrame, docsRef: DataFrame): DataFrame = {
      val bench = docsRef.filter(col("doc_id") % 97 === 1)
      val clean = graft.core.OpCaches.persistTracked(
        exact.join(Dedup.contaminatedDocs(exact, bench).select("doc_id"),
          Seq("doc_id"), "left_anti"))
      val filtered = Curation.topFractionBounded(
        clean, TextFunctions.qualityScore(col("text")), Seq("lang"),
        "doc_id", 0.75)
      val mixed = Curation.tokenBudget(filtered,
        TextFunctions.qualityScore(col("text")),
        TextFunctions.tokenCount(col("text")),
        Seq("source"), "doc_id", budget = 800L)
      val sampled = Sampling.stratifiedSampleRows(
        mixed.drop("cum_tokens"), Seq("lang"), "doc_id", 50)
      graft.core.StaticRange.denseIdSort(
        Chunking.chunkByTokens(sampled.select(col("doc_id"), col("text")),
          window = 32, stride = 24),
        docsRef, "doc_id", Seq(col("doc_id").asc, col("chunk_id").asc))
    }

    def oldExactClusters(d: DataFrame): DataFrame = {
      val keepers = Dedup.exactClusters(d)
        .filter(col("is_dup") === 0).select(col("doc_id"))
      d.join(keepers, Seq("doc_id"), "left_semi")
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "pipe_join_window" -> (() => {
        val gated = docs.join(
          Curation.gopherGate(docs, minTokens = 25)
            .filter(col("keep") === 1).select("doc_id"),
          Seq("doc_id"), "left_semi")
        downstream(oldExactClusters(gated), docs)
      }),
      "pipe_join_gbmin" -> (() => {
        val gated = docs.join(
          Curation.gopherGate(docs, minTokens = 25)
            .filter(col("keep") === 1).select("doc_id"),
          Seq("doc_id"), "left_semi")
        downstream(Dedup.dedupExact(gated), docs)
      }),
      "pipe_join_gbmin_floor" -> (() => {
        val gated = docs.join(
          Curation.gopherGate(
            graft.core.Parallelism.kernelFloor(docs), minTokens = 25)
            .filter(col("keep") === 1).select("doc_id"),
          Seq("doc_id"), "left_semi")
        downstream(Dedup.dedupExact(gated), docs)
      }),
      "pipe_keep_native" -> (() => {
        val gated = docs.join(
          graft.core.Parallelism.kernelFloor(docs)
            .filter(graft.functions.RepetitionFunctions
              .gopher_keep(col("text"), minTokens = 25))
            .select("doc_id"),
          Seq("doc_id"), "left_semi")
        downstream(Dedup.dedupExact(gated), docs)
      }),
      "pipe_gate_persist" -> (() => {
        val gated = graft.core.OpCaches.persistTracked(docs.join(
          Curation.gopherGate(
            graft.core.Parallelism.kernelFloor(docs), minTokens = 25)
            .filter(col("keep") === 1).select("doc_id"),
          Seq("doc_id"), "left_semi"))
        downstream(Dedup.dedupExact(gated), docs)
      }))

    // PROBE_PHASES=1: cumulative stage cuts of the registered form
    if (sys.env.get("PROBE_PHASES").contains("1")) {
      for (r <- 1 to 3) {
        graft.core.OpCaches.release(); spark.catalog.clearCache()
        def gated = docs.join(
          Curation.gopherGate(
            graft.core.Parallelism.kernelFloor(docs), minTokens = 25)
            .filter(col("keep") === 1).select("doc_id"),
          Seq("doc_id"), "left_semi")
        val t0 = System.nanoTime()
        gated.write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        val exact = Dedup.dedupExact(gated)
        exact.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        val bench = docs.filter(col("doc_id") % 97 === 1)
        val clean = graft.core.OpCaches.persistTracked(
          exact.join(Dedup.contaminatedDocs(exact, bench).select("doc_id"),
            Seq("doc_id"), "left_anti"))
        clean.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        val filtered = Curation.topFractionBounded(
          clean, TextFunctions.qualityScore(col("text")), Seq("lang"),
          "doc_id", 0.75)
        filtered.write.format("noop").mode("overwrite").save()
        val t4 = System.nanoTime()
        val mixed = Curation.tokenBudget(filtered,
          TextFunctions.qualityScore(col("text")),
          TextFunctions.tokenCount(col("text")),
          Seq("source"), "doc_id", budget = 800L)
        val sampled = Sampling.stratifiedSampleRows(
          mixed.drop("cum_tokens"), Seq("lang"), "doc_id", 50)
        sampled.write.format("noop").mode("overwrite").save()
        val t5 = System.nanoTime()
        graft.core.StaticRange.denseIdSort(
          Chunking.chunkByTokens(sampled.select(col("doc_id"), col("text")),
            window = 32, stride = 24),
          docs, "doc_id", Seq(col("doc_id").asc, col("chunk_id").asc))
          .write.format("noop").mode("overwrite").save()
        val t6 = System.nanoTime()
        def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.2f"
        println(s"PHASES r$r gate=${s(t0, t1)} dedup=${s(t1, t2)} clean=${s(t2, t3)} quality=${s(t3, t4)} mix+sample=${s(t4, t5)} chunk+sort=${s(t5, t6)}")
      }
    }

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
      println(f"PROBE $n%-18s med=${ProbeUtil.median(ts)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
