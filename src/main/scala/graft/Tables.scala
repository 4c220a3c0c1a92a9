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

  /** [[evalResults]] pruned to the rank prefix `evaluate` can see —
    * identical measures, a fraction of the window cost.
    *
    * The full fixture's per-query `global_rank` window shuffles and
    * sorts EVERY result row into at most |queries| busy tasks — at
    * sf0.1 that is 600 k rows sorted 8 ways, the dominant cost of the
    * whole c2 family (C2Probe round 13: the fixture window alone is
    * ~60% of c2_evaluate's wall). But a precision sweep at depths
    * ≤ `depth` can only ever COUNT a row that ranks among the first
    * `depth` of some step's shard union, and a row with `depth`
    * same-(grain) predecessors (same query + shard [+ bucket], higher
    * score or equal score with lower gdocid) can never be that row:
    * those predecessors are in every union its own unit belongs to,
    * so they exhaust the count budget first —
    *
    *  - any counted row (`__mrn <= k <= depth`) is kept: fewer than
    *    `depth` union predecessors implies fewer than `depth`
    *    same-unit predecessors;
    *  - conversely a pruned row's `depth` same-unit predecessors are
    *    each kept (each has < depth same-unit predecessors), so after
    *    pruning every row that follows the pruned one still has
    *    >= depth predecessors in the union — ordinals at or below
    *    `depth` and the count saturation at `depth` are unchanged.
    *
    * So: a bounded [[graft.functions.TopKFunctions.top_k]] heap per
    * (query, shard[, bucket]) — map-side combined, <= depth rows per
    * unit per task cross the wire, never a corpus-wide sort — then
    * the same per-query ordinal window over the <= units x depth
    * survivors. `global_rank` VALUES differ from the full fixture's
    * (ordinals among survivors), but `evaluate` consumes the column
    * only as an ordering, so every measure matrix is row-identical
    * (EvaluateSuite pins all three registered forms against the full
    * fixture; the DuckDB oracles replay the full-frame derivation).
    * This is the 100 TB shape for a rank sweep: the corpus-sized
    * results frame reduces BEFORE anything query-keyed shuffles.
    *
    * `rel` rides the heap inside the id: gdocid is unique per row, so
    * `gdocid * 2 + rel` preserves the (score desc, gdocid asc)
    * tiebreak order and decodes exactly.
    */
  def evalResultsPruned(spark: SparkSession, dir: String, depth: Int,
      withBuckets: Boolean = false): DataFrame = {
    require(depth >= 1, s"depth must be positive, got $depth")
    val li = lineitem(spark, dir).select(
      (col("l_orderkey") % NumQueries).cast("int").as("query"),
      (col("l_suppkey") % NumShards).cast("int").as("shard"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("gdocid"),
      col("l_extendedprice").as("score"),
      when(col("l_partkey") % 7 === 0, 1).otherwise(0).cast("int").as("rel"))
    val unit = (Seq(col("query"), col("shard")) ++
      (if (withBuckets) Seq((col("gdocid") % NumBuckets).cast("int").as("bucket"))
       else Nil))
    val unitNames = Seq("query", "shard") ++ (if (withBuckets) Seq("bucket") else Nil)
    val kept = li
      .groupBy(unit: _*)
      .agg(graft.functions.TopKFunctions.top_k(col("score"),
        col("gdocid") * 2 + col("rel"), depth).as("__top"))
      .select(unitNames.map(col) :+ explode(col("__top")).as("e"): _*)
      .select(unitNames.map(col) ++ Seq(
        shiftright(col("e.id"), 1).as("gdocid"),
        col("e.score").as("score"),
        col("e.id").bitwiseAND(1).cast("int").as("rel")): _*)
    val w = Window.partitionBy(col("query"))
      .orderBy(col("score").desc, col("gdocid").asc)
    kept.withColumn("global_rank", row_number().over(w).cast("int"))
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
