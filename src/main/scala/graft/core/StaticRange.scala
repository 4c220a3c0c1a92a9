package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Total-order sort WITHOUT the range-sampling job, for frames whose
  * leading sort key has a small KNOWN integer domain.
  *
  * `orderBy` plans a range exchange whose `RangePartitioner` first
  * runs a separate sampling job over the child RDD — re-executing
  * everything beneath the sort that is not behind a materialized
  * exchange, plus one extra job round per action (JobGapProbe round
  * 13: ~0.12 s work + ~0.05 s gap on the c6 selection pipeline at
  * sf0.1). When the caller KNOWS the leading key's domain — the
  * selective-search query ids are dense 0..|Q|-1 by construction —
  * the split points need no sampling at all: route each row directly
  * to partition `pid` via Spark's shuffle-partition-id pass-through
  * (`DirectShufflePartitionID`, the DataFrame-era analog of Hadoop's
  * classic `TotalOrderPartitioner` with precomputed bounds), then
  * sort within partitions. Partition index order IS leading-key
  * order, so the concatenated output equals `orderBy(sortCols)`
  * exactly.
  *
  * Scale contract: the pass-through shuffle uses an explicit
  * partition count, which AQE leaves alone (REPARTITION_BY_NUM
  * origin) — so per-key skew is the CALLER's to manage: one
  * partition per leading-key value is right when values are few and
  * balanced (the |Q|-way selective-search sorts); a deployment with
  * a wide or skewed domain should pass a finer `pid` (e.g.
  * key * k + hash-bucket folded over a secondary sort prefix) or
  * fall back to the sampling sort. Rows whose pid falls outside
  * [0, numParts) fail loudly in-plan rather than silently misroute.
  */
object StaticRange {

  /** `df.orderBy(sortCols)` with the sampling job replaced by a
    * bounds PROBE when the leading sort key is a non-negative
    * integral id: min/max come from one driver job over `boundsSrc`
    * — typically the SOURCE table, whose column-pruned id scan is
    * trivial next to re-executing `df`'s pipeline (the reason
    * vocab_encode adopted this shape, r13) — and each row routes to
    * partition id/ceil-width directly. `df`'s leading sort key must
    * be drawn from `boundsSrc`'s `idCol` domain (a subset is fine:
    * partitions just run lighter). Non-integral or negative domains
    * fall back to the sampling sort. Sparse or skewed ids only
    * unbalance the final single-stage sort, never break its total
    * order.
    */
  /** `partsMultiplier` scales the partition count above
    * defaultParallelism: rows whose mass per leading-key value is
    * SKEWED (the pair lists: id_a is the least member of each pair,
    * so mass decays linearly across the id range) keep a ~2x
    * straggler at 1x, while finer partitions let the scheduler pack
    * the imbalance — the r18 100x pair corpus measured 14.0 s at 1x
    * vs 10.1 s at 8x (sampling orderBy: 19.7 s).
    */
  /** Whether a column's type may take the dense-id bounds path: the
    * ONE definition of the guard, shared by [[denseIdSort]] and every
    * FUSED probe that computes bounds on its behalf (the SparkEntry
    * gate+bounds aggregate) — a non-integral id whose values only
    * partially cast to long must fall back to the sampling sort on
    * every path, and under ANSI the cast itself can throw, so probes
    * must skip their min/max legs entirely when this is false.
    */
  def integralIdType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  def denseIdSort(df: DataFrame, boundsSrc: DataFrame, idCol: String,
      sortCols: Seq[Column], partsMultiplier: Int = 1): DataFrame = {
    val integralId = integralIdType(boundsSrc.schema(idCol).dataType)
    val bounds =
      if (integralId)
        boundsSrc.agg(min(col(idCol).cast("long")),
            max(col(idCol).cast("long")))
          .head() match {
          case r if r.isNullAt(0) || r.getLong(0) < 0 => None
          case r => Some((r.getLong(0), r.getLong(1)))
        }
      else None
    denseIdSortKnownBounds(df, bounds, idCol, sortCols, partsMultiplier)
  }

  /** [[denseIdSort]] with CALLER-provided id bounds — for callers
    * that already know the domain, or probed it inside a FUSED
    * aggregate (the registered minhash pair rows fold the duplicate-
    * mass gate probe and the sort bounds into one driver job, r19).
    * `None`, a negative min, or an inverted range falls back to the
    * sampling `orderBy`.
    */
  def denseIdSortKnownBounds(df: DataFrame, bounds: Option[(Long, Long)],
      idCol: String, sortCols: Seq[Column],
      partsMultiplier: Int = 1): DataFrame =
    bounds match {
      case Some((minId, maxId)) if minId >= 0 && maxId >= minId =>
        val parts = math.max(1,
          df.sparkSession.sparkContext.defaultParallelism) *
          math.max(1, partsMultiplier)
        // ceil-width division: pid < parts for every id <= maxId, no
        // multiply overflow, monotone in the id
        val width = (maxId + 1 + parts - 1) / parts
        sortByKnownDomain(df,
          (col(idCol).cast("long") / lit(math.max(1L, width))).cast("int"),
          parts, sortCols)
      case _ => df.orderBy(sortCols: _*)
    }

  /** `df` totally ordered by `sortCols`, where `pid` must be an
    * integer column equal to the rank of the row's leading sort key
    * in its domain (0-based, < numParts), non-null, and
    * non-decreasing in the leading sort key.
    */
  def sortByKnownDomain(df: DataFrame, pid: Column, numParts: Int,
      sortCols: Seq[Column]): DataFrame = {
    require(numParts > 0, s"numParts $numParts must be positive")
    val guarded = when(pid.isNotNull && pid >= 0 && pid < numParts, pid)
      .otherwise(raise_error(concat(
        lit(s"StaticRange.sortByKnownDomain: pid outside [0, $numParts): "),
        pid.cast("string"))).cast("int"))
    val passThrough = org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.DirectShufflePartitionID(
        org.apache.spark.sql.graft.ColumnBridge.expression(guarded.cast("int"))))
    df.repartition(numParts, passThrough)
      .sortWithinPartitions(sortCols: _*)
  }
}
