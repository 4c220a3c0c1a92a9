package graft.examples

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.{Components, Dedup}

/** Dev probe: convergence round counts of the connected-components
  * operator on the minhash pair graphs (informs the oracle's
  * unrolled-CTE depth).
  */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val pairs = Dedup.minHashCandidates(Tables.documents(spark, s"/root/testdata/$d"))
      val (labels, rounds) = Components.runRounds(pairs, "id_a", "id_b", 40)
      println(s"CC_ROUNDS $d pairs=${pairs.count()} nodes=${labels.count()} rounds=$rounds")
      graft.core.OpCaches.release()
    }
    spark.stop()
  }
}
