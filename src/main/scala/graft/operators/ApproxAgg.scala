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

  /** Misra-Gries frequent-items summary (Misra & Gries 1982; merge
    * rule per Agarwal et al., "Mergeable Summaries", PODS 2012):
    * at most `k` counters; any item with true frequency > n/(k+1)
    * is GUARANTEED present after any sequence of reduces and merges.
    * Counts are lower bounds and merge-order-dependent — which is
    * why [[heavyHitters]] uses the summary only to NOMINATE.
    */
  private[operators] class MisraGries(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, (Map[String, Long], Long), (Seq[String], Long)] {
    require(k > 0, s"k must be positive, got $k")
    // the buffer rides the TOTAL item count beside the summary, so
    // one pass yields both the candidates and n
    def zero: (Map[String, Long], Long) = (Map.empty, 0L)
    def reduce(b: (Map[String, Long], Long),
        item: String): (Map[String, Long], Long) = {
      val m = b._1.get(item) match {
        case Some(c) => b._1.updated(item, c + 1)
        case None if b._1.size < k => b._1.updated(item, 1L)
        case None => // decrement-all, drop zeros (the MG step)
          b._1.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }
      (m, b._2 + 1)
    }
    def merge(x: (Map[String, Long], Long),
        y: (Map[String, Long], Long)): (Map[String, Long], Long) = {
      val sum = y._1.foldLeft(x._1) { case (m, (item, c)) =>
        m.updated(item, m.getOrElse(item, 0L) + c)
      }
      val merged =
        if (sum.size <= k) sum
        else {
          // subtract the (k+1)-th largest count from all, keep > 0 —
          // the mergeable-summaries rule that preserves the n/(k+1)
          // presence guarantee across arbitrary merge trees
          val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
          sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
        }
      (merged, x._2 + y._2)
    }
    def finish(b: (Map[String, Long], Long)): (Seq[String], Long) =
      (b._1.keys.toSeq.sorted, b._2)
    def bufferEncoder: org.apache.spark.sql.Encoder[(Map[String, Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: org.apache.spark.sql.Encoder[(Seq[String], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** EXACT heavy hitters at sketch cost: all items whose frequency
    * exceeds `supportNum/supportDen` of the total, found by a
    * Misra-Gries NOMINATE pass (bounded ≤ k counters per task, the
    * total item count ridden on the same aggregate) followed by an
    * exact recount of only the ≤ k candidates. The MG presence
    * guarantee means no true heavy hitter can be missed, and the
    * exact recount discards sketch noise — so the output equals the
    * brute-force `HAVING cnt * den > n * num` answer at ANY
    * parallelism (the merge-order-dependent sketch counts never
    * reach the output), while the full item universe never crosses
    * a shuffle: the wire carries one ≤ k-entry summary per task plus
    * the candidate recount.
    *
    * The support threshold is an exact-integer cross-multiplication
    * (`cnt * den > n * num`) — no float anywhere, the house rule.
    */
  def heavyHitters(df: DataFrame, itemCol: Column,
      supportNum: Long, supportDen: Long): DataFrame = {
    require(supportNum > 0 && supportNum < supportDen,
      s"support $supportNum/$supportDen must be in (0, 1)")
    // capacity: k >= den/num guarantees presence at the threshold.
    // The cap bounds BOTH the per-task summary and the driver's
    // candidate collect; it also forecloses the Int wrap a den/num
    // past 2^31 would silently produce. 100k (not 1e6): the MG
    // decrement-all step rebuilds the immutable counter map (one
    // O(k) pass per event), so a tail-heavy stream can approach
    // O(n*k) per partition near the cap — at k <= 1e5 that worst
    // case stays tractable; raising the cap would first need a
    // mutable offset-compacted buffer.
    require(supportDen / supportNum < 100000,
      s"support $supportNum/$supportDen needs ~${supportDen / supportNum} " +
        "counters per task and on the driver — too small to be a " +
        "heavy-hitter question; use a plain aggregate")
    val k = (supportDen / supportNum + 1).toInt
    // NULL items are excluded by contract (frequency-of-NULL is not
    // a heavy-hitter question, and three-valued isin() could not
    // recount it anyway) — filter upstream if a null group matters
    val items = df.select(itemCol.cast("string").as("item"))
      .filter(col("item").isNotNull)
      .transform(graft.core.OpCaches.persistTracked)
    val spark = items.sparkSession
    import spark.implicits._
    val mg = new MisraGries(k).toColumn
    // ONE nominate pass yields the ≤ k candidate strings AND the
    // total n (ridden in the aggregator buffer); the driver holds
    // only the bounded candidate set (the gated-collect discipline)
    val (cands, n) = items.as[String].select(mg).first()
    items.filter(col("item").isin(cands: _*))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * supportDen > lit(n) * supportNum)
      .orderBy(col("cnt").desc, col("item").asc)
  }
}
