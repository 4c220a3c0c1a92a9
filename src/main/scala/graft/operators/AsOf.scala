package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row with
  * `rightTime <= leftTime` within the same key group. The reference
  * has no such operator (SURVEY.md §2.9); Spark has no built-in
  * either. Rather than a custom physical operator, the scalable
  * relational formulation: tag both sides, union, and take a
  * last-non-null window over (key, time) — ONE shuffle keyed by the
  * join keys, no range explosion, no per-key driver loop. A custom
  * `SparkPlan` would only beat this by the tag/filter overhead, at
  * the cost of bypassing AQE and codegen.
  */
object AsOf {

  /** @param on        equi-join keys present on both sides
    * @param leftTime  left event-time column (numeric/orderable)
    * @param rightTime right event-time column, same type
    * @param rightVals right columns to carry onto left rows
    *                  (must not collide with left column names)
    *
    * Right rows with equal (key, time) must be unique for a
    * deterministic result — pre-deduplicate if unsure.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame =
    asofJoin(left, right, on, leftTime, rightTime, rightVals, forward = false)

  /** Forward as-of join: for each left row, the EARLIEST right row
    * with `rightTime >= leftTime` in the same key group — the "next
    * event after" mirror of [[asofJoinBackward]] (reversed window
    * frame, `first` instead of `last`; the match is inclusive at
    * equal times on both variants).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame =
    asofJoin(left, right, on, leftTime, rightTime, rightVals, forward = true)

  private def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      forward: Boolean): DataFrame = {
    val leftOnly = left.columns.filterNot(on.contains).toSeq
    require(rightVals.intersect(left.columns.toSeq).isEmpty,
      s"rightVals collide with left columns: ${rightVals.intersect(left.columns.toSeq).mkString(",")}")
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select((on ++ leftOnly).map(col) ++ Seq(col("__t"), col("__side")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(on.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__t"), col("__side")) ++ rightVals.map(col): _*)
    // BOTH variants run as an O(n) RUNNING frame (unboundedPreceding
    // -> currentRow + last()): a frame anchored at unboundedFollowing
    // makes WindowExec re-scan to the partition end for EVERY row
    // (quadratic per partition). backward: time ascending, right
    // (side 0) before left at equal time -> inclusive. forward: time
    // DESCENDING (the mirror traversal) with right still first at
    // equal time, so "last right seen so far" is the earliest right
    // at-or-after the row — identical semantics, linear cost.
    val w0 = Window.partitionBy(on.map(col): _*)
    val w =
      if (forward)
        w0.orderBy(col("__t").desc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        w0.orderBy(col("__t").asc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // all rightVals ride in ONE struct filled by a single last(): a
    // legitimately-NULL value column must come from the SAME matched
    // right row as its siblings, not fill from another
    val pick: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => last(c, ignoreNulls = true).over(w)
    val packed = l.unionByName(r)
      .withColumn("__rv",
        when(col("__side") === 0, struct(rightVals.map(col): _*)))
      .withColumn("__rv", pick(col("__rv")))
    rightVals.foldLeft(packed) { (df, c) =>
        df.withColumn(c, col("__rv").getField(c))
      }
      .filter(col("__side") === 1).drop("__t", "__side", "__rv")
  }
}
