package graft.selectivesearch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.DataUtils.ensureHasColumns

/** Greedy per-query bucket-budget resolution
  * (reference: dataproc/selectivesearch.py:160-181).
  *
  * The one algorithm in the reference that is not relational algebra:
  * per query, walk (shard, bucket) rows in `rank` order; picking a row
  * costs `bucket + 1 - alreadyTaken(shard)` contiguous buckets; skip
  * rows already covered (cost < 1) or that would exceed `threshold`;
  * stop at exactly `threshold`; emit the contiguous bucket prefix
  * 0..n-1 per shard.
  *
  * Spark shape: `groupByKey(query).flatMapGroups` — one shuffle keyed
  * by query, the greedy walk runs compiled per group (the reference
  * does an interpreted `iterrows` loop), queries resolve in parallel
  * across partitions. Per-query state is an Array[Int](numShards).
  */
object BucketResolver {

  def resolveBucketSelection(selection: DataFrame, threshold: Int): DataFrame = {
    ensureHasColumns(selection, Seq("query", "shard", "bucket", "rank"))
    val spark = selection.sparkSession
    import spark.implicits._
    val ds = selection.select(
      col("query").cast("long").as("query"),
      col("shard").cast("int").as("shard"),
      col("bucket").cast("int").as("bucket"),
      col("rank").cast("int").as("rank")
    ).as[(Long, Int, Int, Int)]
    val resolved = ds.groupByKey(_._1).flatMapGroups { (query, rows) =>
      // pandas sorts by rank with a stable sort (input order breaks
      // ties); (shard, bucket) is the deterministic stand-in.
      val sorted = rows.toArray.sortBy { case (_, shard, bucket, rank) => (rank, shard, bucket) }
      // The reference sizes per-query state from a GLOBAL max(shard)
      // (reference :161); a shard the group never mentions has
      // taken == 0 and emits nothing, so the group's own max is
      // output-identical — and saves a full extra scan plus a driver
      // round-trip for the scalar agg (it was the frame's second pass).
      val numShards = sorted.iterator.map(_._2).max + 1
      val taken = new Array[Int](numShards)
      var total = 0
      var i = 0
      while (i < sorted.length && total < threshold) {
        val (_, shard, bucket, _) = sorted(i)
        val cost = bucket + 1 - taken(shard)
        if (cost >= 1 && total + cost <= threshold) {
          taken(shard) += cost
          total += cost
        }
        i += 1
      }
      for {
        shard <- (0 until numShards).iterator
        b <- 0 until taken(shard)
      } yield (query, shard, b)
    }.toDF("query", "shard", "bucket")
    // Preserve the caller's query dtype (fixtures use int, testdata long).
    val queryType = selection.schema("query").dataType
    resolved.withColumn("query", col("query").cast(queryType))
  }
}
