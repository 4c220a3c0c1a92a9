package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.operators.{Components, Dedup}

/** Dev probe: phase-by-phase wall time of the neardup_clusters path
  * under bench-like session conf. Optional arg: the sf dir (default
  * sf0.1) — r17 runs it on target/skew10 for the adversarial-skew
  * attribution.
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CC_PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rep <- 1 to 2) {
      graft.core.OpCaches.release()
      spark.catalog.clearCache()
      println(s"=== rep $rep")
      val pairs = t("minhash") {
        val p = Dedup.minHashCandidates(Tables.documents(spark, dir))
          .persist(StorageLevel.MEMORY_AND_DISK)
        println(s"CC_PAIRS ${p.count()}")
        p
      }
      val (labels, rounds) = t("cc_loop") {
        Components.runRounds(pairs, "id_a", "id_b", 40)
      }
      t("final_count") { labels.groupBy("label").count().count() }
      println(s"CC_ROUNDS $rounds")
      pairs.unpersist()
    }
    spark.stop()
  }
}
