package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding feature engineering: per-group centroid construction
  * (mean-pool + L2-normalize) — the "build a class/cluster/domain
  * prototype" step of an embedding pipeline (SemDeDup cluster
  * centroids, per-label prototypes for nearest-class-mean
  * classification, per-source corpus fingerprints).
  *
  * Exactness: mean-pooling then L2-normalizing is scale-invariant,
  * so the normalized centroid equals the QUANTIZED COMPONENT SUMS
  * normalized directly — `value_p = qsum_p / sqrt(Σ_p qsum_p²)` —
  * and the 1/(n·scale) mean factor cancels. Every input to the final
  * division is an exact integer (the [[Similarity.quantize]] grid,
  * summed exactly; squares summed in DECIMAL(38,0) so a group of up
  * to ~10^15 rows cannot overflow), which makes the output doubles
  * bit-identical in any engine at any parallelism — the same
  * integer-parts-then-one-division recipe as [[Similarity.cosineQ]].
  *
  * Scale shape: one explode (corpus × dim narrow rows, map-side
  * combined into per-(group, pos) partial sums before the exchange),
  * one (group, pos)-keyed shuffle of those sums, then everything
  * downstream is |groups| × dim sized; the norm frame is |groups|
  * rows and broadcast back. No window over corpus-sized partitions,
  * no driver collect. The output is a bounded |groups| × dim matrix,
  * so it takes the single-partition presentation sort (the
  * SCALING.md bounded-output convention, like the evaluate family).
  */
object Embeddings {

  /** One row per (group, pos): the L2-normalized mean-pooled centroid
    * component `value` of `embCol` over each `groupCol` group. A
    * degenerate all-zero group yields 0.0 components (not NaN), the
    * [[Similarity.assignCos]] convention for zero-norm vectors.
    */
  def groupCentroids(df: DataFrame, groupCol: String,
      embCol: String = "embedding"): DataFrame = {
    val exploded = df
      .select(col(groupCol), posexplode(Similarity.quantize(col(embCol))))
      .toDF(groupCol, "pos", "qx")
    val sums = exploded.groupBy(col(groupCol), col("pos"))
      .agg(sum(col("qx")).as("qsum"))
    val norms = sums.groupBy(col(groupCol))
      .agg(sum(col("qsum").cast("decimal(19,0)") *
        col("qsum").cast("decimal(19,0)")).as("ssq"))
    sums.join(broadcast(norms), Seq(groupCol))
      .select(col(groupCol), col("pos").cast("int").as("pos"),
        when(col("ssq") === 0, lit(0.0))
          .otherwise(col("qsum").cast("double") / sqrt(col("ssq").cast("double")))
          .as("value"))
      // narrow single-partition presentation sort: the segment above
      // the (group, pos) aggregation exchange is |groups| x dims rows
      // by contract, so the one-task merge is free and skips the
      // shuffle round a repartition(1) would add (CoalesceSortProbe)
      .coalesce(1)
      .sortWithinPartitions(col(groupCol), col("pos"))
  }
}
