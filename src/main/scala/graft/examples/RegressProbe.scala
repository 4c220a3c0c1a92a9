package graft.examples

/** Dev probe: the round-13 wrong-direction movers, interleaved.
  *
  * VERDICT r13 flagged three recorded-board regressions on untouched
  * rows — `minhash_lsh_pairs` +0.79 s (1.47x), `embedding_incremental_prebuilt`
  * +0.59 s (1.71x), `ann_pq_topk` +0.32 s (2.30x) — with load_pre
  * 2.31 on the recording host as the suspected cause. This probe
  * runs exactly those rows (plus stable controls that did NOT move,
  * so a shared-cause shift is visible) interleaved round-robin under
  * the bench session conf: per-row medians across rounds land within
  * the same ambient conditions, which is the only way a load story
  * can be pinned rather than asserted. Also carries the round-14
  * `ann_pq_fitted_topk` serving rewrite for its before/after.
  *
  * Usage: REPS=5 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *   sbt "runMain graft.examples.RegressProbe"
  */
object RegressProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("regress-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("REPS", "5").toInt
    val names = sys.env.get("PROBE_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq(
        // movers
        "minhash_lsh_pairs", "embedding_incremental_prebuilt", "ann_pq_topk",
        // controls (stable r12->r13): same families, did not move
        "minhash_incremental_pairs", "ann_pq_prebuilt_topk", "simhash_pairs",
        // round-14 rewrite under test
        "ann_pq_fitted_topk"))
    // store-dependent rows build on first touch; one untimed warm
    // round populates the index store and codegen caches
    val times = collection.mutable.Map[String, Vector[Double]]()
    for (r <- 0 to rounds; n <- names) {
      graft.core.OpCaches.release(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      if (r > 0) times(n) = times.getOrElse(n, Vector.empty) :+ t
    }
    names.foreach { n =>
      val ts = times(n)
      println(f"PROBE $n%-34s med=${ProbeUtil.median(ts)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
