package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata tables plus the derived
  * selective-search frames (FIXTURES.md §3): deterministic
  * (query, shard, bucket, score) analogs of the reference's data model
  * carved out of `lineitem`, shared between `SparkEntry.queries` and
  * the DuckDB oracle SQL (which re-derives them with identical
  * expressions).
  *
  * Determinism across engines is designed in: modulo keys, raw-column
  * scores, exact integer-valued sums (`l_quantity`), and explicit
  * total-order tiebreaks in every window.
  */
object Tables {

  val NumQueries = 8
  val NumShards = 4
  val NumBuckets = 2

  /** Memoized per (session, path): `read.parquet` builds a fresh
    * file index and re-reads footers for schema on EVERY call, which
    * at 60+ sub-second queries x 3 bench reps is pure floor. A
    * catalog-registered table resolves this once — this cache is the
    * same behavior for path-based reads, INCLUDING the same staleness
    * contract: the plan snapshots the file listing, so regenerating a
    * parquet dir mid-session requires a new session (the driver
    * regenerates testdata only between JVMs). The outer map is
    * size-bounded: past 512 entries it clears wholesale, so a JVM
    * that churns many sessions (test suites) cannot pin every stopped
    * session's plans and file indexes forever. (A weak-keyed map
    * would not work here — the cached DataFrame strongly references
    * its own session, resurrecting the key through the value.)
    * Scope note: this is a BENCH-HARNESS cache — short-lived
    * sessions, immutable test parquet. A long-lived multi-session
    * service would want per-session eviction on SparkSession stop (a
    * listener) instead of the wholesale clear, and staleness
    * detection if inputs can be rewritten in-session; deliberately
    * not built here.
    */
  private val readCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Boolean), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (readCache.size > 512) readCache.clear()
    val enabled = spark.conf.get("graft.smallScanRebalance", "false").toBoolean
    readCache.computeIfAbsent((spark, s"$dir/$name.parquet", enabled),
      key => rebalanceSmallScan(key._1, key._1.read.parquet(key._2), key._2, key._3))
  }

  /** Small-input scan rebalance — MEASURED OFF by default. A parquet
    * file below `spark.sql.files.maxPartitionBytes` with a single row
    * group yields ONE scan split no matter the conf (byte-range splits
    * can't divide a row group), so every kernel fused into the scan
    * stage — text tokenize, embedding quantize — runs on one core.
    * The tempting fix is a round-robin rebalance to the session's
    * parallelism before the heavy expressions (the Spark analog of
    * DuckDB's intra-row-group morsel parallelism). The interleaved
    * A/B (RebalanceProbe, sf0.1, round 13) measured it a LOSS on
    * every query shape tried — text-kernel rows included (lm 0.80 →
    * 1.53 s, text_stats 0.38 → 0.80 s, c2 0.65 → 1.43 s): the extra
    * exchange's single-task serialize-and-write of the raw rows plus
    * one more stage round costs more than the scan-stage kernels it
    * parallelizes at any sub-maxPartitionBytes size. Kept as an
    * opt-in knob (`graft.smallScanRebalance=true`, keyed into the
    * read memo) for genuinely compute-bound scan kernels; the size
    * gate (>= 512 KB, < maxPartitionBytes) keeps it off broadcast
    * dims and off large inputs, which split naturally.
    */
  private def rebalanceSmallScan(spark: SparkSession, df: DataFrame,
      path: String, enabled: Boolean): DataFrame = {
    if (!enabled) return df
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      } catch { case _: Exception => return df }
    val cores = spark.sparkContext.defaultParallelism
    val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
    if (cores > 1 && bytes >= 512L * 1024 && bytes < maxPart)
      df.repartition(cores)
    else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  /** The events table's `ts` contract for every consumer is LONG
    * epoch-NANOS: epoch-bucket derivations are exact integer
    * arithmetic (ns magnitudes exceed 2^53 — never divide in double)
    * and the DuckDB oracle mirrors them with epoch_ns/us/ms(ts),
    * which are storage-resolution-independent. The on-disk layout has
    * shipped two ways — TIMESTAMP(NANOS) (readable only as raw long
    * via nanosAsLong) and, since the 2026-08 testdata refresh,
    * timestamp[us] (read as TIMESTAMP_NTZ) — so normalize by dtype.
    * The NTZ wall-clock is UTC by convention (exactly what DuckDB's
    * epoch_us assumes); the conversion is timestampdiff between two
    * NTZ values — pure wall-clock arithmetic, independent of the
    * session timezone (an LTZ cast would silently shift every ts in
    * a session not pinned to UTC).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ =>
        raw.withColumn("ts", expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000L"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Per-shard results analog (reference contract
    * dataproc/selectivesearch.py:106-112) derived from lineitem.
    */
  def results(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir).select(
      (col("l_orderkey") % NumQueries).cast("int").as("query"),
      (col("l_suppkey") % NumShards).cast("int").as("shard"),
      (col("l_linenumber") % NumBuckets).cast("int").as("bucket"),
      col("l_extendedprice").as("score"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("gdocid"))

  /** Results with the upstream-produced evaluation columns the
    * reference assumes (its quirk Q7): `global_rank` (per-query global
    * ordinal by score) and a 0/1 relevance column `rel`.
    */
  def evalResults(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir).select(
      (col("l_orderkey") % NumQueries).cast("int").as("query"),
      (col("l_suppkey") % NumShards).cast("int").as("shard"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("gdocid"),
      col("l_extendedprice").as("score"),
      when(col("l_partkey") % 7 === 0, 1).otherwise(0).cast("int").as("rel"))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("score").desc, col("gdocid").asc)
    li.withColumn("global_rank", row_number().over(w).cast("int"))
  }

  /** Shard selection analog: one row per (query, shard), ranked by
    * total quantity mass descending (exact integer-valued sum — the
    * same rank in any engine), shard ascending as tiebreak.
    */
  def selection(spark: SparkSession, dir: String): DataFrame = {
    val agg = lineitem(spark, dir)
      .groupBy(
        (col("l_orderkey") % NumQueries).cast("int").as("query"),
        (col("l_suppkey") % NumShards).cast("int").as("shard"))
      .agg(sum(col("l_quantity")).as("mass"))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("mass").desc, col("shard").asc)
    agg.withColumn("rank", (row_number().over(w) - 1).cast("int"))
  }

  /** Unranked shard scores for the `evaluate(sort = true)` path: one
    * row per (query, shard) with an exact-integer `shard_score`
    * (summed price cents — deliberately a DIFFERENT mass than
    * [[selection]]'s quantity ranks, so the sorted path produces its
    * own ranking rather than coinciding with the precomputed one).
    */
  def shardScores(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(
        (col("l_orderkey") % NumQueries).cast("int").as("query"),
        (col("l_suppkey") % NumShards).cast("int").as("shard"))
      .agg(sum(cents(col("l_extendedprice"))).as("shard_score"))

  /** Bucket selection analog: one row per (query, shard, bucket). */
  def bucketSelection(spark: SparkSession, dir: String): DataFrame = {
    val agg = lineitem(spark, dir)
      .groupBy(
        (col("l_orderkey") % NumQueries).cast("int").as("query"),
        (col("l_suppkey") % NumShards).cast("int").as("shard"),
        (col("l_linenumber") % NumBuckets).cast("int").as("bucket"))
      .agg(sum(col("l_quantity")).as("mass"))
    val w = Window.partitionBy(col("query"))
      .orderBy(col("mass").desc, col("shard").asc, col("bucket").asc)
    agg.withColumn("rank", (row_number().over(w) - 1).cast("int"))
  }

  /** Money columns carry exactly 2 decimals; `round(x*100)` quantizes
    * them to exact BIGINT cents, so sums are exact integers and
    * engine-order-independent. Divide once at the end for a
    * bit-identical double in any engine.
    */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 100).cast("long")
}
