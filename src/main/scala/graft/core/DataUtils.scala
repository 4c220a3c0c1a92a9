package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raised when a required column is absent from a frame.
  * Mirrors the reference's assert-on-use schema checking
  * (reference: dataproc/data.py:23-27).
  */
class MissingColumnException(column: String)
    extends IllegalArgumentException(s"Column $column missing in data frame")

/** General data utilities (reference: dataproc/data.py). */
object DataUtils {

  /** Asserts `df` contains every column in `columns`
    * (reference: dataproc/data.py:23-27).
    */
  def ensureHasColumns(df: DataFrame, columns: Seq[String]): Unit = {
    val present = df.columns.toSet
    columns.foreach { c =>
      if (!present.contains(c)) throw new MissingColumnException(c)
    }
  }

  /** Cartesian product of integer ranges as a DataFrame
    * (reference: dataproc/data.py:7-21).
    *
    * The reference materializes the product eagerly via recursive
    * `pd.concat`; here it is a lazy chain of `crossJoin`s over
    * `spark.range`, so the product is never a driver-side bottleneck.
    * Columns are cast to int to match the reference's int dtype.
    *
    * Row order is NOT part of the contract (Spark has no stable row
    * order); consumers that need the reference's odometer order use
    * the arithmetic position column from [[cartesianWithPos]].
    */
  def cartesian(spark: SparkSession, ranges: Seq[Seq[Long]], names: Seq[String]): DataFrame = {
    require(ranges.nonEmpty, "cartesian of zero ranges")
    require(ranges.length == names.length, "ranges/names length mismatch")
    import spark.implicits._
    val dfs = ranges.zip(names).map { case (r, n) =>
      r.toDF(n).select(col(n).cast("int").as(n))
    }
    dfs.reduce(_.crossJoin(_))
  }

  /** Cartesian product with an explicit `pos` column giving the
    * reference's row position: odometer order, first range major
    * (reference: dataproc/data.py:15-21). `pos` makes the positional
    * column bind (reference: dataproc/selectivesearch.py:80,90)
    * expressible as an equi-join instead of relying on row order —
    * see SURVEY.md §7 hard-part 1.
    */
  def cartesianWithPos(spark: SparkSession, ranges: Seq[Seq[Long]], names: Seq[String]): DataFrame = {
    val df = cartesian(spark, ranges, names)
    // pos = sum_i idx_i * prod_{j>i} |range_j| ; ranges here are seqs of
    // the actual values, whose index within the seq is its odometer digit.
    val sizes = ranges.map(_.length.toLong)
    val strides = sizes.scanRight(1L)(_ * _).tail // stride per digit
    // Map each value to its index within its range via a small lookup join
    // when the range is not 0-based contiguous; fast path: 0-based range.
    val posExpr = ranges.zip(names).zip(strides).map { case ((r, n), stride) =>
      val isCanonical = r.zipWithIndex.forall { case (v, i) => v == i }
      val idx =
        if (isCanonical) col(n).cast("long")
        else {
          // inline CASE lookup (ranges are tiny, driver-side)
          r.zipWithIndex.foldLeft(lit(null).cast("long")) { case (acc, (v, i)) =>
            when(col(n) === lit(v), lit(i.toLong)).otherwise(acc)
          }
        }
      idx * lit(stride)
    }.reduce(_ + _)
    df.withColumn("pos", posExpr)
  }
}
