package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: cost of the fitted-codebook PQ chain at a given SF —
  * how expensive would a registered rows-only query be?
  */
object FittedPqProbe {
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
      println(f"FITPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    for (round <- 1 to 2) {
      graft.core.OpCaches.release()
      spark.catalog.clearCache()
      println(s"--- round $round ---")
      val e = graft.Tables.embeddings(spark, sfDir)
      val cb = t("fit_codebook")(
        graft.operators.Pq.kmeansCodebook(e, m = 4, ksub = 16))
      val out = t("pq_plan")(graft.operators.Pq.pqTopK(
        e, e.filter(col("vec_id") < 8), 5, codebooks = Some(cb)))
      t("execute")(out.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
