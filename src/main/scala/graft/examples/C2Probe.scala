package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase costs inside c2_evaluate at sf0.1 — fixture
  * window vs selection build vs the arrival walk.
  */
object C2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"C2PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (round <- 1 to 2) {
      graft.core.OpCaches.release(); spark.catalog.clearCache()
      println(s"--- round $round ---")
      t("evalResults_noop")(graft.Tables.evalResults(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
      t("selection_noop")(graft.Tables.selection(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
      t("c2_full")(graft.SparkEntry.queries("c2_evaluate")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
