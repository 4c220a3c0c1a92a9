package graft.examples

import org.apache.spark.sql.execution.FormattedMode

/** Dev probe (r21): execute one query and print its FINAL adaptive
  * plan (isFinalPlan=true) — the only view that shows whether AQE's
  * stage cache actually reused the duplicated assignment legs
  * (ReusedExchange / table cache hits), which the static PlanDump
  * cannot show under AQE.
  *
  * Usage: runMain graft.examples.R21FinalPlan [query]
  */
object R21FinalPlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("knn_join")
    val spark = ProbeUtil.benchSession("r21-final-plan")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println("R21FINALPLAN-BEGIN " + name)
    println(df.queryExecution.explainString(FormattedMode))
    println("R21FINALPLAN-END")
    spark.stop()
  }
}
