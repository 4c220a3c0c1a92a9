package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score-based corpus curation: keep the best `fraction` of rows per
  * stratum — the standard quality-filtering step of a training-data
  * pipeline (e.g. top 25% by quality score per language).
  *
  * Deterministic by construction: the rank orders by (score desc,
  * id asc), so ties cut identically in any engine at any parallelism,
  * and the kept count is an exact `ceil(fraction * n)` per stratum.
  *
  * Scale shape: one shuffle on the stratum key; rank and stratum size
  * come from the same window partition (no second pass). For heavily
  * skewed strata the rank window ships the stratum's full rows to one
  * partition — if that bites, pre-aggregate a per-stratum count and
  * use [[Sampling.stratifiedSample]]-style bounded top-k with
  * k = ceil(fraction * n) instead.
  */
object Curation {

  /** Rows whose (scoreCol desc, idCol asc) rank within their stratum
    * is <= ceil(fraction * stratum size). Adds nothing, drops rows.
    */
  def topFraction(df: DataFrame, scoreCol: Column, strataCols: Seq[String],
      idCol: String, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction $fraction not in (0,1]")
    val strata = strataCols.map(col)
    val w = Window.partitionBy(strata: _*)
    val ranked = df
      .withColumn("__score", scoreCol)
      .withColumn("__rank", row_number().over(
        w.orderBy(col("__score").desc, col(idCol).asc)))
      .withColumn("__n", count(lit(1)).over(w))
    ranked
      .filter(col("__rank") <= ceil(col("__n") * fraction))
      .drop("__score", "__rank", "__n")
  }
}
