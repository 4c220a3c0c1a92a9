package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev probe: per-JOB wall spans and inter-job driver gaps for the
  * weak sub-second rows (round-13 burn-down). A SparkListener records
  * every job's (start, end); the probe prints, for the LAST (warm)
  * rep of each query, the job timeline relative to the action start —
  * job work vs driver gaps (AQE stage finalization, next-stage
  * planning, codegen lookups) is exactly the split that decides
  * whether a row's cost amortizes at 100x data (gaps do, work may).
  *
  * Usage: runMain graft.examples.JobGapProbe [query ...]
  * (defaults to the round-13 weak list).
  */
object JobGapProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("jobgap-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq
      else Seq("c2_evaluate", "c6_select", "c7_select_decay",
        "c2_evaluate_buckets", "ann_ivf_prebuilt_topk", "ann_pq_fitted_topk")

    val jobs = scala.collection.mutable.Map[Int, (Long, Long, Int)]() // id -> (t0, t1, nstages)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(js.jobId) = (js.time, 0L, js.stageInfos.size) }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(je.jobId).foreach { case (t0, _, n) =>
            jobs(je.jobId) = (t0, je.time, n)
          }
        }
    })

    // session warm-up outside any timing, like Bench
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      var last: Seq[(Int, Long, Long, Int)] = Seq.empty
      var t0Action = 0L
      var wall = 0.0
      (1 to reps).foreach { _ =>
        graft.core.OpCaches.release()
        spark.catalog.clearCache()
        System.gc()
        jobs.synchronized(jobs.clear())
        t0Action = System.currentTimeMillis()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        wall = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a moment to drain
        // (private listenerBus.waitUntilEmpty is inaccessible here)
        Thread.sleep(500)
        last = jobs.synchronized(
          jobs.toSeq.map { case (id, (a, b, n)) => (id, a, b, n) }.sortBy(_._2))
      }
      println(f"== $name  wall=$wall%.3f s  jobs=${last.size}")
      var prevEnd = t0Action
      var gapSum = 0.0
      var workSum = 0.0
      last.foreach { case (id, a, b, n) =>
        val gap = (a - prevEnd) / 1e3
        val work = (b - a) / 1e3
        gapSum += math.max(0.0, gap); workSum += work
        println(f"   job $id%3d  +${(a - t0Action) / 1e3}%6.3f  work=$work%6.3f  gapBefore=$gap%6.3f  stages=$n")
        prevEnd = math.max(prevEnd, b)
      }
      val tail = (t0Action + (wall * 1000).toLong - prevEnd) / 1e3
      println(f"   sum: work=$workSum%.3f  gaps=$gapSum%.3f  tailAfterLastJob=$tail%.3f")
    }
    spark.stop()
  }
}
