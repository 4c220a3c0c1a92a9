package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SkewScan

/** Dev probe: window vs blocked vs hybrid forms of the per-key scans
  * (lag, sessionize) on the r17 events corpora
  * (target/events_uni10 = 15k uniform users, target/events_skew10 =
  * one user owning 50% of 1M events). Interleaved reps under
  * bench-like session conf; prints median seconds per (corpus, form).
  */
object SkewScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = 5
    val dirs = Seq("target/events_uni10", "target/events_skew10")

    def base(dir: String): DataFrame =
      graft.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000000").as("t"),
          graft.Tables.cents(col("value")).as("vc"))

    def lagWindow(ev: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t").asc, col("event_id").asc)
      ev.withColumn("prev", lag(col("t"), 1).over(w))
    }
    def sesWindow(ev: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      ev.withColumn("prev", lag(col("t"), 1).over(w))
        .withColumn("new_s",
          (col("prev").isNull || (col("t") - col("prev")) > 1800000L).cast("int"))
        .withColumn("sidx", sum(col("new_s"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sidx"))
        .agg(min(col("t")).as("session_start_ms"),
          max(col("t")).as("session_end_ms"),
          count(lit(1)).cast("int").as("n_events"),
          (sum(col("vc")).cast("double") / 100).as("total_value"))
        .drop("sidx")
    }

    val forms: Seq[(String, String => DataFrame)] = Seq(
      "lag_window" -> (d => lagWindow(base(d))),
      "lag_blocked" -> (d => SkewScan.lagBlocked(
        base(d), "user_id", "t", "event_id", "prev")),
      "lag_hybrid" -> (d => SkewScan.lagSkewSafe(
        base(d), "user_id", "t", "event_id", "prev",
        hotThreshold = 100000L)),
      "ses_window" -> (d => sesWindow(base(d))),
      "ses_blocked" -> (d => SkewScan.sessionizeBlocked(
        base(d), "user_id", "t", "event_id", "vc", 1800000L)),
      "ses_hybrid" -> (d => SkewScan.sessionizeSkewSafe(
        base(d), "user_id", "t", "event_id", "vc", 1800000L,
        hotThreshold = 100000L)),
      // the registered rows end in an output sort — these isolate
      // whether the skew delta rides the window or the final range
      // exchange fed by the hot hash partition
      "lag_window_sorted" -> (d => lagWindow(base(d))
        .orderBy(col("user_id").asc, col("t").asc, col("event_id").asc)),
      "ses_window_sorted" -> (d => sesWindow(base(d))
        .orderBy("user_id", "session_start_ms")))

    val times = scala.collection.mutable.Map[(String, String),
      Vector[Double]]().withDefaultValue(Vector.empty)
    // untimed warm pass, then interleaved timed reps
    for (r <- 0 to reps; d <- dirs; (name, f) <- forms) {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      f(d).write.format("noop").mode("overwrite").save()
      if (r > 0)
        times((d, name)) = times((d, name)) :+ (System.nanoTime() - t0) / 1e9
    }
    for (d <- dirs; (name, _) <- forms) {
      val xs = times((d, name)).sorted
      println(f"SKEWSCAN $d $name median=${xs(xs.size / 2)}%.2f s " +
        s"reps=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
