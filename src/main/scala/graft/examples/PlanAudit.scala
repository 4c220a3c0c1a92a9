package graft.examples
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("quality_topp", "sample_bernoulli", "sample_stratified",
        "c2_evaluate_sorted", "knn_join", "embedding_incremental_pairs",
        "events_resample_ohlc", "vocab_encode")) {
      graft.core.OpCaches.release()
      val p = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(p).size
      val scans = "Scan parquet".r.findAllIn(p).size
      val schema = "ReadSchema: [^\n]+".r.findFirstIn(p).getOrElse("?")
      println(s"AUDIT $q exchanges=$nEx scans=$scans $schema")
    }
    spark.stop()
  }
}
