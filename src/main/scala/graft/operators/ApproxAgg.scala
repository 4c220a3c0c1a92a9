package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the documented 100 TB twins
  * of the exact forms on the registered queries.
  *
  * Exact `percentile()` buffers every distinct (value, count) of a
  * group in executor memory, so a single hot group (one language, one
  * event type) breaks at corpus scale. `approx_percentile` keeps
  * O(accuracy) state per group with the guarantee |rank(returned) -
  * target_rank| <= n / accuracy (Greenwald-Khanna-style quantile
  * summary as implemented by Spark's ApproximatePercentile).
  * Exact `countDistinct` rewrites the aggregation into an expand +
  * two-phase distinct shuffle on every (group, value) pair;
  * `approx_count_distinct` is HyperLogLog++ (Heule et al., EDBT 2013)
  * with fixed ~kilobyte state and relative standard deviation `rsd`.
  *
  * Both sketches are MERGEABLE, so partial aggregation stays map-side
  * — the shuffle carries one sketch per (task, group), not the data.
  *
  * Sketch internals differ across engines, so these forms cannot be
  * DuckDB-hash-oracled; ApproxAggSuite pins them against the exact
  * forms within the documented error bounds instead (the exact forms
  * themselves are oracle rows: `percentiles`, `distinct_agg`).
  */
object ApproxAgg {

  /** Default sketch parameters — referenced by the registered
    * `approx_agg_bounds` audit row, so its error-bound literals and
    * the sketches it audits cannot drift apart.
    */
  val DefaultAccuracy: Int = 10000
  val DefaultRsd: Double = 0.05

  /** Per-group approximate percentiles of `valueCol`: one array column
    * `p_approx` aligned with `percentiles`. Rank error <= n/accuracy
    * per group.
    */
  def approxPercentiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, percentiles: Seq[Double],
      accuracy: Int = DefaultAccuracy): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(percentiles.map(lit): _*), lit(accuracy)).as("p_approx"))

  /** Per-group approximate distinct counts of each column in
    * `countCols` (as `<name>_approx`), relative error ~rsd.
    */
  def approxDistinct(df: DataFrame, groupCols: Seq[String],
      countCols: Seq[String], rsd: Double = DefaultRsd): DataFrame = {
    val aggs: Seq[Column] = countCols.map(c =>
      approx_count_distinct(col(c), rsd).as(s"${c}_approx"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
