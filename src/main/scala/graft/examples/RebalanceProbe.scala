package graft.examples

/** Dev probe: interleaved A/B of the loader's small-scan rebalance
  * (`graft.smallScanRebalance`) under the bench session conf. The
  * rebalance parallelizes scan-fused kernels at the price of a
  * single-task shuffle write of the raw rows — which side wins is
  * per-table (heavy text kernels vs cheap narrow arithmetic), so it
  * must be measured per query, interleaved in ONE session (ambient
  * load moves back-to-back probe runs by 30%+).
  *
  * Usage: runMain graft.examples.RebalanceProbe [query ...]
  */
object RebalanceProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("rebalance-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("bm25_topk", "lm_perplexity", "vocab_encode", "c2_evaluate",
        "ann_ivf_twolevel")

    // session warm-up outside any timing, like Bench
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    def time(name: String, on: Boolean): Double = {
      spark.conf.set("graft.smallScanRebalance", on.toString)
      graft.core.OpCaches.release()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { name =>
      // one untimed warm rep per arm (codegen caches), then interleave
      time(name, on = true); time(name, on = false)
      val (as, bs) = (1 to reps).map { _ =>
        (time(name, on = true), time(name, on = false))
      }.unzip
      println(f"== $name%-22s rebalON=${ProbeUtil.median(as)}%.3f  " +
        f"rebalOFF=${ProbeUtil.median(bs)}%.3f  " +
        f"(on: ${as.map(x => f"$x%.2f").mkString(",")} | " +
        f"off: ${bs.map(x => f"$x%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
