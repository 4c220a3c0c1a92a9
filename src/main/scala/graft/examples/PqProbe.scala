package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase timing inside the IVF+PQ chain at sf0.1 — where do
  * the ~2 s go? Times each driver-side step and the final action
  * separately, twice (cold/warm), to separate codegen-compile floor
  * from execution.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PQPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm parquet machinery
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    for (round <- 1 to 2) {
      graft.core.OpCaches.release()
      spark.catalog.clearCache()
      println(s"--- round $round ---")
      val e = t("read")(graft.Tables.embeddings(spark, sfDir))
      val q = e.filter(col("vec_id") < 8)
      val out = t("build_plan")(
        graft.operators.Pq.ivfPqTopK(e, q, 5, numCentroids = 64, nprobe = 8))
      t("execute")(out.write.format("noop").mode("overwrite").save())
      t("execute2")(out.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
