package graft.examples

import org.apache.spark.sql.SparkSession

import graft.operators.Components

/** Dev probe: does multi-jump actually contract the pointer chains?
  * Ordered-id chain of 4000 nodes — simulation says J=1 -> 12 rounds,
  * J=3 -> 5.
  */
object JumpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val chain = (0L until 4000L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("id_a", "id_b")
    for (j <- Seq(1, 2, 3)) {
      val t0 = System.nanoTime()
      val (_, rounds) = Components.runRounds(chain, "id_a", "id_b", 40, jumpsPerRound = j)
      println(f"JUMP_PROBE J=$j rounds=$rounds wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
