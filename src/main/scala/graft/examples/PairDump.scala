package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.Dedup

/** Dev probe: dump the sf0.1 minhash candidate pair graph for offline
  * structure analysis (component sizes, id ordering along chains).
  */
object PairDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Dedup.minHashCandidates(Tables.documents(spark, "/root/testdata/sf0.1"))
      .coalesce(1).write.mode("overwrite").parquet("/tmp/pairs_sf01")
    spark.stop()
  }
}
