package graft.examples

import org.apache.spark.sql.execution.FormattedMode

/** Dump the FINAL adaptive plan (isFinalPlan=true) for a list of
  * declared queries: execute each through the noop sink under the
  * bench session conf, then write `explainString(FormattedMode)` to
  * `<out>/<name>_<suffix>.txt`. The batch cousin of R21FinalPlan —
  * one JVM for the whole evidence set instead of one per query.
  *
  * Usage: runMain graft.examples.FinalPlanDump <outDir> <suffix> [names...]
  */
object FinalPlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r22")
    val suffix = if (args.length > 1) args(1) else "final"
    val names = if (args.length > 2) args.drop(2).toSeq else Seq("knn_join")
    val spark = ProbeUtil.benchSession("r22-final-plan")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      graft.core.OpCaches.release()
      spark.catalog.clearCache()
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          df.queryExecution.explainString(FormattedMode))
        println(s"FINALPLAN_OK $name")
      } catch { case e: Throwable =>
        println(s"FINALPLAN_FAIL $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
