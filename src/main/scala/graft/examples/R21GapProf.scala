package graft.examples

/** Dev probe (r21): sample the MAIN driver thread's stack while one
  * query executes its noop write, and histogram the deepest
  * graft/catalyst frames — ground truth for where the PQ family's
  * inter-job driver gap (JobGapProbe: 0.9-1.4 s with no job running)
  * actually goes (optimizer? codegen source generation? Janino?
  * literal construction?).
  *
  * Usage: runMain graft.examples.R21GapProf [query] [reps]
  */
object R21GapProf {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("ann_ivfpq_topk")
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = ProbeUtil.benchSession("r21-gap-prof")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    val fn = graft.SparkEntry.queries(name)
    // warm pass
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    graft.core.OpCaches.release()

    val main = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var run = true
    val sampler = new Thread(() => {
      while (run) {
        val st = main.getStackTrace
        // classify by the first interesting frame
        val key = st.find { f =>
          val c = f.getClassName
          c.startsWith("org.apache.spark.sql.catalyst.optimizer") ||
          c.startsWith("org.apache.spark.sql.catalyst.expressions.codegen") ||
          c.startsWith("org.codehaus.janino") ||
          c.startsWith("org.apache.spark.sql.execution.WholeStageCodegen") ||
          c.startsWith("org.apache.spark.sql.catalyst.analysis") ||
          c.startsWith("org.apache.spark.sql.catalyst.plans") ||
          c.startsWith("org.apache.spark.sql.catalyst.trees") ||
          c.startsWith("org.apache.spark.sql.execution.adaptive") ||
          c.startsWith("org.apache.spark.sql.execution.exchange") ||
          c.startsWith("graft")
        }.map(f => s"${f.getClassName}.${f.getMethodName}")
          .getOrElse(st.headOption
            .map(f => s"${f.getClassName}.${f.getMethodName}").getOrElse("idle"))
        hist.merge(key, 1, (a, b) => a + b)
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    (1 to reps).foreach { _ =>
      graft.core.OpCaches.release(); spark.catalog.clearCache()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    }
    run = false
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"R21GAPPROF $name reps=$reps wall=$wall%.2f s")
    import scala.jdk.CollectionConverters._
    hist.asScala.toSeq.sortBy(-_._2).take(30).foreach { case (k, v) =>
      println(f"R21GAPPROF $v%6d  $k")
    }
    spark.stop()
  }
}
