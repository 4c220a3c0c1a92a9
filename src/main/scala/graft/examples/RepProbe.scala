package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev probe: is the repetition_profile kernel evaluated once per row
  * (whole-stage-codegen subexpression elimination) or once per
  * extracted field? Counts kernel call sites in the generated code and
  * times the 8-extract projection against a single-extract one.
  */
object RepProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = graft.functions.RepetitionFunctions.repetition_profile(col("text"))
    val q = Tables.documents(spark, "/root/testdata/sf0.1").select(
      col("doc_id"),
      p.getItem(0).as("a"), p.getItem(1).as("b"), p.getItem(2).as("c"),
      p.getItem(3).as("d"), p.getItem(4).as("e"), p.getItem(5).as("f"),
      p.getItem(6).as("g"), p.getItem(7).as("h"))
    val code = org.apache.spark.sql.execution.debug.codegenString(
      q.queryExecution.executedPlan)
    val calls = "repetitionProfile\\(".r.findAllIn(code).size
    println(s"REP_PROBE kernel_call_sites=$calls")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"REP_PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("eight_extracts") { q.write.format("noop").mode("overwrite").save() }
    val q1 = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), p.getItem(0).as("a"))
    time("one_extract") { q1.write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
