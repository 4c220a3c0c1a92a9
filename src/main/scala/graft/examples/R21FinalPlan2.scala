package graft.examples
import org.apache.spark.sql.execution.FormattedMode
object R21FinalPlan2 {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("knn_join")
    val spark = ProbeUtil.benchSession("r21-final-plan2")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    println("R21FP2-BEGIN")
    println(df.queryExecution.explainString(FormattedMode))
    println("R21FP2-END")
    spark.stop()
  }
}
