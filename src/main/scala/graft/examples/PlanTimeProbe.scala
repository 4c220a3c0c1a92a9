package graft.examples

/** Dev probe: split each query's wall into DataFrame CONSTRUCTION
  * (operator code + any build collects), plan ANALYSIS+OPTIMIZATION+
  * PHYSICAL PLANNING (executedPlan force), and EXECUTION (noop write)
  * — the decomposition that tells driver-tax rows from work rows.
  *
  * Usage: runMain graft.examples.PlanTimeProbe [query ...]
  */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("plantime-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("ann_ivfpq_rerank", "ann_ivf_twolevel", "ann_ivf_topk")

    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    names.foreach { name =>
      (1 to reps).foreach { rep =>
        graft.core.OpCaches.release(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis->physical plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"$name%-22s rep$rep construct=${(t1 - t0) / 1e9}%.3f " +
          f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f " +
          f"total=${(t3 - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
