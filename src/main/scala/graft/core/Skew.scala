package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handling covers
  * sort-merge joins at runtime; explicit salting remains the tool for
  * broadcast-ineligible skewed aggregations and for joins where a few
  * hot keys dominate (the 100 TB failure mode: one reducer owning a
  * hot key's entire partition).
  */
object Skew {

  /** Equi-join with the small side replicated `factor` times and the
    * large side's rows scattered across the replicas: each hot key's
    * rows spread over `factor` reducers instead of one. The join
    * RESULT is independent of the salt (every large-side row meets
    * exactly one replica of its key's small-side rows).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase (salted partial + final) grouped aggregation for
    * hot-key-skewed counts/sums: first aggregate per (key, salt),
    * then combine per key. Result equals the direct aggregation.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    df.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }
}
