package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-key-safe forms of the per-key ordered-scan operators (lag,
  * sessionize). A plain `Window.partitionBy(key)` puts EVERY row of a
  * key in one task; on a skewed event stream (round-17 hot-key
  * corpus: one user owning 50% of 1M events) that task is the whole
  * job, and at cluster scale a billion-event key is a straggler no
  * executor can absorb.
  *
  * The blocked decomposition: split each key's stream into disjoint
  * TIME blocks (`t div blockSpan` — block ranges are disjoint and
  * increasing, so per-block maxima are ordered), run the scan within
  * (key, block) partitions — the hot key dilutes across #blocks
  * tasks — and repair block boundaries through a per-(key, block)
  * summary frame whose per-key window is at most #blocks rows, never
  * #events. Two narrow extra exchanges buy per-task work bounded by
  * blockSpan's densest window instead of the hottest key's row count.
  * Same decomposition MPP engines use for skewed running aggregates
  * (segmented-scan / two-phase prefix sums, Blelloch 1990).
  *
  * Exactness: block assignment is monotone in t, ties in t land in
  * the same block, and summaries carry exact values — every output
  * row is bit-identical to the single-partition window form
  * (suite-pinned in OperatorsSuite).
  *
  * WHEN TO USE WHICH (measured, SCALING.md round 17): the plain
  * window form wins at every scale where the hottest key fits a
  * task's sort budget — a 500k-row hot key sorts in-task in ~0.2 s
  * while blocking everything pays repair joins whose summary frame is
  * input-sized for sparse keys. Register the window form by default;
  * switch to the [[lagSkewSafe]]/[[sessionizeSkewSafe]] hybrids when
  * keys can exceed ~10^6–10^7 rows (the `hotThreshold` knob — only
  * above-threshold keys pay the blocked machinery, and the hot-key
  * list is ≤ rows/threshold entries so it always broadcasts). Note
  * the downstream caveat either way: any operator hash-partitioned by
  * a hot key hands its NEXT exchange a single-task read of that key's
  * rows, so end-to-end per-task work is bounded by rows-per-key
  * unless the hot key is spread (which the blocked forms do).
  */
object SkewScan {

  // typed Column API, not a SQL string (a backtick in the column name
  // would break `expr` parsing): floor of the double division is a
  // monotone non-decreasing, deterministic function of t, which is all
  // the decomposition needs — block ranges disjoint and increasing,
  // equal t in equal blocks. (Epoch-ms magnitudes sit well inside a
  // double's 53-bit exact-integer range, so the division is monotone
  // even under rounding.)
  private def blk(tCol: String, blockSpan: Long): Column =
    floor(col(tCol) / lit(blockSpan.toDouble))

  /** `lag(t, 1)` over (key, (t, id)-ordered stream), blocked: returns
    * the input columns plus `prevCol` (null for each key's first
    * row). The boundary repair: per-(key, block) max(t) is ordered by
    * block (disjoint increasing time ranges), so each block's first
    * row takes the PREVIOUS non-empty block's max — exactly the
    * stream predecessor.
    */
  def lagBlocked(df: DataFrame, keyCol: String, tCol: String,
      idCol: String, prevCol: String,
      blockSpan: Long = 3600L * 1000): DataFrame =
    withBlockedPrev(df.withColumn("__blk", blk(tCol, blockSpan)),
      keyCol, tCol, idCol, prevCol)
      .drop("__blk")

  /** [[lagBlocked]] body over a frame that already carries `__blk` —
    * shared with [[sessionizeBlocked]], which needs the block column
    * again for its prefix-sum repair.
    */
  private def withBlockedPrev(blocked: DataFrame, keyCol: String,
      tCol: String, idCol: String, prevCol: String): DataFrame = {
    val wIn = Window.partitionBy(col(keyCol), col("__blk"))
      .orderBy(col(tCol).asc, col(idCol).asc)
    val local = blocked.withColumn("__prev_in", lag(col(tCol), 1).over(wIn))
    val wBlk = Window.partitionBy(col(keyCol)).orderBy(col("__blk"))
    val boundary = local.groupBy(col(keyCol), col("__blk"))
      .agg(max(col(tCol)).as("__bmax"))
      .withColumn("__prev_blk", lag(col("__bmax"), 1).over(wBlk))
      .drop("__bmax")
    local.join(boundary, Seq(keyCol, "__blk"))
      .withColumn(prevCol, coalesce(col("__prev_in"), col("__prev_blk")))
      .drop("__prev_in", "__prev_blk")
  }

  /** Keys whose row count exceeds `threshold` — the broadcastable hot
    * list the hybrid routers split on. One map-side-combined count
    * agg; output is AT MOST #rows/threshold keys, so it broadcasts at
    * any corpus size.
    */
  private def hotKeys(df: DataFrame, keyCol: String,
      threshold: Long): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > threshold).select(col(keyCol))

  /** Hybrid hot-key-safe lag — the form a skewed deployment registers.
    * Keys with ≤ `hotThreshold` rows take the plain per-key window
    * (one task per key is FINE when the key fits a task: the r17
    * measurement found the single-window sort of a 500k-row hot key
    * costs ~0.1 s, while blocking EVERYTHING costs more than it saves
    * below ~10^7 rows/key — sparse keys make the boundary-summary
    * frame as big as the input). Only keys ABOVE the threshold route
    * through [[lagBlocked]]'s time-block dilution, where the summary
    * frame is #blocks rows per hot key — tiny by construction. Same
    * split-only-the-skew principle as AQE's skew-join handling.
    */
  def lagSkewSafe(df: DataFrame, keyCol: String, tCol: String,
      idCol: String, prevCol: String, hotThreshold: Long = 1000000L,
      blockSpan: Long = 3600L * 1000): DataFrame = {
    // three consumers (hot-key count agg, left_anti, left_semi) —
    // persist so an expensive upstream plan is scanned once, not
    // three times (same discipline as Dedup.neardupComponents)
    val in = graft.core.OpCaches.persistTracked(df)
    val hot = broadcast(hotKeys(in, keyCol, hotThreshold))
    val cold = in.join(hot, Seq(keyCol), "left_anti")
    val wCold = Window.partitionBy(col(keyCol))
      .orderBy(col(tCol).asc, col(idCol).asc)
    wireOrder(df,
      cold.withColumn(prevCol, lag(col(tCol), 1).over(wCold))
        .unionByName(lagBlocked(in.join(hot, Seq(keyCol), "left_semi"),
          keyCol, tCol, idCol, prevCol, blockSpan)))
  }

  /** Hybrid hot-key-safe sessionization: cold keys through the plain
    * window form, hot keys through [[sessionizeBlocked]] — same
    * routing rationale as [[lagSkewSafe]]. Output-identical to the
    * single-window form (suite-pinned).
    */
  def sessionizeSkewSafe(ev: DataFrame, keyCol: String, tCol: String,
      idCol: String, valCol: String, gap: Long,
      hotThreshold: Long = 1000000L,
      blockSpan: Long = 3600L * 1000): DataFrame = {
    // persist against the triple consumption, as in lagSkewSafe
    val in = graft.core.OpCaches.persistTracked(ev)
    val hot = broadcast(hotKeys(in, keyCol, hotThreshold))
    val cold = in.join(hot, Seq(keyCol), "left_anti")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tCol).asc, col(idCol).asc)
    val coldSessions = cold
      .withColumn("__prev", lag(col(tCol), 1).over(w))
      .withColumn("__new_s",
        (col("__prev").isNull || (col(tCol) - col("__prev")) > gap)
          .cast("int"))
      .withColumn("__sidx", sum(col("__new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__sidx"))
      .agg(
        min(col(tCol)).as("session_start_ms"),
        max(col(tCol)).as("session_end_ms"),
        count(lit(1)).cast("int").as("n_events"),
        (sum(col(valCol)).cast("double") / 100).as("total_value"))
      .drop("__sidx")
    coldSessions.unionByName(sessionizeBlocked(
      in.join(hot, Seq(keyCol), "left_semi"),
      keyCol, tCol, idCol, valCol, gap, blockSpan))
  }

  // the union re-orders nothing the callers rely on (every registered
  // query ends in an explicit orderBy), but keep the row shape of the
  // input's column order for lag outputs
  private def wireOrder(src: DataFrame, out: DataFrame): DataFrame =
    out.select((src.columns.map(col) :+
      col(out.columns.last)).toIndexedSeq: _*)

  /** 30-min-gap style sessionization, blocked — output-identical to
    * the single-window form used by `sessionize_batch`:
    * (key, session_start_ms, session_end_ms, n_events, total_value)
    * with total_value = sum(valCol)/100 (valCol pre-scaled to cents).
    *
    * The session index is a per-key running sum of session-start
    * flags; blocked it becomes (within-block running sum) + (sum of
    * PRIOR blocks' flags), the prior sums coming from the same
    * per-(key, block) summary-frame shape as the lag repair.
    */
  def sessionizeBlocked(ev: DataFrame, keyCol: String, tCol: String,
      idCol: String, valCol: String, gap: Long,
      blockSpan: Long = 3600L * 1000): DataFrame = {
    val withPrev = withBlockedPrev(
      ev.withColumn("__blk", blk(tCol, blockSpan)),
      keyCol, tCol, idCol, "__prev")
      .withColumn("__new_s",
        (col("__prev").isNull || (col(tCol) - col("__prev")) > gap)
          .cast("int"))
    val wIn = Window.partitionBy(col(keyCol), col("__blk"))
      .orderBy(col(tCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withPrev.withColumn("__s_in", sum(col("__new_s")).over(wIn))
    val wPrior = Window.partitionBy(col(keyCol)).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prior = local.groupBy(col(keyCol), col("__blk"))
      .agg(sum(col("__new_s")).as("__bsum"))
      .withColumn("__prior", coalesce(sum(col("__bsum")).over(wPrior), lit(0L)))
      .drop("__bsum")
    local.join(prior, Seq(keyCol, "__blk"))
      .withColumn("__sidx", col("__s_in") + col("__prior"))
      .groupBy(col(keyCol), col("__sidx"))
      .agg(
        min(col(tCol)).as("session_start_ms"),
        max(col(tCol)).as("session_end_ms"),
        count(lit(1)).cast("int").as("n_events"),
        (sum(col(valCol)).cast("double") / 100).as("total_value"))
      .drop("__sidx")
  }
}
