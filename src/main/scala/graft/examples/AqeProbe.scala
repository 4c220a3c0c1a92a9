package graft.examples

/** Dev probe: interleaved AQE on/off A/B per registered query, under
  * the bench session conf — the measurement behind
  * [[graft.core.SessionTuning.boundedPlan]]'s row selection. Rows
  * whose exchanges are all bounded/broadcast pay AQE's per-stage
  * re-optimization for nothing; rows with data-dependent exchanges
  * (corpus-sized range sorts, coalescible wide shuffles) may need it.
  *
  * Usage: runMain graft.examples.AqeProbe [query ...]
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("aqe-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("bm25_topk", "lm_perplexity", "c2_evaluate", "c6_select",
        "vocab_encode", "ngram_jaccard_pairs")

    val off = spark.newSession()
    off.conf.set("spark.sql.adaptive.enabled", "false")

    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    def time(name: String, s: org.apache.spark.sql.SparkSession): Double = {
      graft.core.OpCaches.release()
      spark.catalog.clearCache(); off.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { name =>
      time(name, spark); time(name, off) // warm both arms
      val (as, bs) = (1 to reps).map { _ =>
        (time(name, spark), time(name, off))
      }.unzip
      println(f"== $name%-24s aqeON=${ProbeUtil.median(as)}%.3f  " +
        f"aqeOFF=${ProbeUtil.median(bs)}%.3f  " +
        f"(on: ${as.map(x => f"$x%.2f").mkString(",")} | " +
        f"off: ${bs.map(x => f"$x%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
