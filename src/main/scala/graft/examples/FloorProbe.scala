package graft.examples

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev probe: per-query session-floor cost of tiny queries under
  * candidate runtime configs (informs the Bench harness settings).
  * All probed configs are runtime-settable, so one JVM measures every
  * variant back-to-back on identical warmed machinery.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag")).count().collect()

    val queries =
      if (args.lift(1).contains("heavy"))
        Seq("minhash_lsh_pairs", "ngram_jaccard_pairs", "simhash_pairs",
          "embedding_neardup_pairs", "u1_union_all")
      else Seq("j4_cartesian", "distinct_agg", "rollup_agg",
        "percentiles", "j5_positional_bind", "q1_lineitem_agg")
    val variants: Seq[(String, Map[String, String])] = Seq(
      "base" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m",
        "spark.sql.shuffle.partitions" -> "32"),
      "coalesce" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m",
        "spark.sql.shuffle.partitions" -> "32"),
      // the Bench harness settings (round 9+)
      "bench" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2m",
        "spark.sql.shuffle.partitions" -> "32"),
      // candidate floor cuts on top of "bench":
      // fewer map-side shuffle/sample tasks for tiny inputs
      "bench_sp8" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2m",
        "spark.sql.shuffle.partitions" -> "8"),
      // smaller range-exchange sample per partition (orderBy tails)
      "bench_rs20" -> Map(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2m",
        "spark.sql.shuffle.partitions" -> "32",
        "spark.sql.execution.rangeExchange.sampleSizePerPartition" -> "20"),
      // r11 question: how much of the sub-second floor is AQE's
      // per-exchange query-stage re-planning rounds themselves?
      "bench_noaqe" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "32",
        "spark.sql.execution.rangeExchange.sampleSizePerPartition" -> "20"))
    def median(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    // reset every probed key to its Spark default before applying a
    // variant's overrides, so measurements don't depend on variant
    // order (a key set by an earlier variant would otherwise leak)
    val probedDefaults = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m",
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.execution.rangeExchange.sampleSizePerPartition" -> "100")
    for ((name, conf) <- variants) {
      (probedDefaults ++ conf).foreach { case (k, v) => spark.conf.set(k, v) }
      val times = queries.map { q =>
        val fn = SparkEntry.queries(q)
        val ts = (1 to 4).map { i =>
          graft.core.OpCaches.release()
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        q -> median(ts.drop(1)) // first rep warms codegen
      }
      println(f"FLOOR $name total=${times.map(_._2).sum}%.3f " +
        times.map { case (q, t) => f"$q=$t%.3f" }.mkString(" "))
    }
    spark.stop()
  }
}
