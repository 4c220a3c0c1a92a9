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
    // scalar max to driver (reference :161): shard-count defines the
    // per-query state array; selection frames are (queries x shards x
    // buckets)-sized, so this agg is cheap.
    val numShards =
      selection.agg(max(col("shard"))).first().getAs[Number](0).intValue() + 1
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
