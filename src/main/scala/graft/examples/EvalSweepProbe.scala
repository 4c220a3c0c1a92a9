package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.selectivesearch.SelectiveSearch
import graft.selectivesearch.SelectiveSearch.{precisionAt, Measure}

/** Dev probe: `evaluate` at EXPERIMENT-SWEEP scale — the reference's
  * own headline loop (dataproc/selectivesearch.py:32-73) runs the
  * step sweep over every query of a TREC topic set against a
  * many-shard index; the registered c2 oracle covers 8 queries x 4
  * shards, which exercises correctness but not the scaling claim.
  *
  * Here: a SYNTHETIC selection experiment at 1,000 queries x 64
  * shards x 50 results per (query, shard) = 3.2M result rows, swept
  * across all 64 steps, comparing
  *   (a) the single-pass arrival walk (`evaluate`, the registered
  *       default for PrecisionAt measures): one shuffle, O(rows),
  *       per-step accumulators — steps are free;
  *   (b) the relational explode sweep (`evaluateExplode`): shuffle
  *       O(rows x steps) — at 64 steps a ~60x shuffle blowup over (a)
  *       on the rows that arrive at step 1;
  *   (c) the per-step loop (64 x `evaluateStep`, union) — the shape a
  *       direct pandas-to-Spark translation of the reference would
  *       take: 64 jobs, each re-joining and re-windowing the corpus.
  * All three produce the same (query, step, p_10, p_5) matrix
  * (spot-checked by hash below before timing).
  *
  * The synthetic frame is deterministic (hash-derived ranks and
  * relevance), built once as parquet under /tmp so every form reads
  * identical bytes.
  */
object EvalSweepProbe {
  def main(args: Array[String]): Unit = {
    val nQueries = args.headOption.map(_.toInt).getOrElse(1000)
    val nShards = 64
    val perShard = 50
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic synthetic experiment: per query, shard ranks are a
    // hash permutation; each (query, shard) contributes `perShard`
    // results whose global_rank interleaves across shards and whose
    // relevance is a hash bit (~30% relevant)
    val base = "/tmp/graft-evalsweep"
    val sel = spark.range(nQueries.toLong * nShards)
      .select((col("id") / nShards).cast("long").as("query"),
        (col("id") % nShards).cast("int").as("shard"))
      .withColumn("rank",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query").orderBy(xxhash64(col("query"), col("shard"))))
          - 1).cast("int"))
    val res = spark.range(nQueries.toLong * nShards * perShard)
      .select((col("id") / (nShards * perShard)).cast("long").as("query"),
        ((col("id") / perShard) % nShards).cast("int").as("shard"),
        col("id").as("k"))
      .withColumn("global_rank",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query").orderBy(xxhash64(col("k")))) - 1)
          .cast("long"))
      .withColumn("rel",
        (pmod(xxhash64(col("k"), lit(7)), lit(10)) < 3).cast("int"))
      .drop("k")
    sel.write.mode("overwrite").parquet(s"$base/selection.parquet")
    res.write.mode("overwrite").parquet(s"$base/results.parquet")
    val selection = spark.read.parquet(s"$base/selection.parquet")
    val results = spark.read.parquet(s"$base/results.parquet")
    val measures: Seq[Measure] = Seq(precisionAt(10), precisionAt(5))

    def arrival(): DataFrame =
      SelectiveSearch.evaluate(selection, results, measures, nShards)
    def explode(): DataFrame =
      SelectiveSearch.evaluateExplode(selection, results, measures, nShards)
    def stepLoop(): DataFrame =
      (1 to nShards).map { s =>
        SelectiveSearch.evaluateStep(selection, results, measures, s)
      }.reduce(_.unionByName(_))
        .select("query", "p_10", "p_5", "step")
        .orderBy("query", "step")

    // equality spot-check before timing (rounded to kill float-sum
    // association differences between the aggregate forms)
    def mat(df: DataFrame) = df
      .select(col("query"), col("step"),
        round(col("p_10"), 9), round(col("p_5"), 9))
      .collect().map(_.toSeq).sortBy(_.toString)
    val a = mat(arrival())
    require(a.length == nQueries * nShards,
      s"expected ${nQueries * nShards} matrix rows, got ${a.length}")
    require(mat(explode()).sameElements(a), "explode != arrival")
    require(mat(stepLoop()).sameElements(a), "stepLoop != arrival")
    println(s"EVALSWEEP matrices agree: ${a.length} rows " +
      s"($nQueries queries x $nShards steps)")

    def time(tag: String)(f: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        graft.core.OpCaches.release(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // Bench.median, not sorted(size/2): the latter is the UPPER
      // middle element at even rep counts, biasing every form high
      println(f"EVALSWEEP $tag median ${graft.Bench.median(ts)}%.2f s  " +
        ts.map(t => f"$t%.2f").mkString("[", ", ", "]"))
    }
    // warm
    arrival().write.format("noop").mode("overwrite").save()
    time("arrival_walk")(arrival())
    time("explode_sweep")(explode())
    time("per_step_loop")(stepLoop())
    spark.stop()
  }
}
