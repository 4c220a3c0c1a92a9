package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for every declared SparkEntry query to
  * one file per query (`<out>/<name>_<suffix>.txt`), under the SAME
  * session conf graft.Bench runs, so the captured plan shape (Exchange
  * count, join strategy, PushedFilters/ReadSchema) is the one the
  * bench actually executes. Planning only — nothing is computed.
  *
  * Usage: runMain graft.examples.PlanDump <outDir> [sfDir] [suffix]
  * SPARK_GRAFT_ONLY=a,b restricts to a subset (same contract as Bench).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r21")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val suffix = if (args.length > 2) args(2) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.execution.rangeExchange.sampleSizePerPartition", "20")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        graft.core.OpCaches.release()
        try {
          val txt = fn(spark, sfDir).queryExecution
            .explainString(FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
          println(s"PLAN_OK $name")
        } catch { case e: Throwable =>
          println(s"PLAN_FAIL $name: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
