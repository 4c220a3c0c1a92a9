package graft.core

import org.apache.spark.sql.types._

/** Fixed schemas / contracts of the engine.
  *
  * The one documented contract in the reference is the per-shard
  * results Parquet schema (reference: dataproc/selectivesearch.py:106-112).
  */
object Schemas {

  /** Per-shard retrieval results Parquet contract
    * (reference: dataproc/selectivesearch.py:106-112).
    */
  val resultsSchema: StructType = StructType(Seq(
    StructField("query", IntegerType),
    StructField("rank", IntegerType),
    StructField("ldocid", LongType),
    StructField("gdocid", LongType),
    StructField("score", DoubleType),
    StructField("shard", IntegerType),
    StructField("bucket", IntegerType)
  ))

  /** Headerless shard/bucket scores CSV contract
    * (reference: dataproc/selectivesearch.py:79,89): one double per
    * line, in exact cartesian row order (query-major, shard, bucket).
    */
  val shardScoresSchema: StructType = StructType(Seq(
    StructField("shard_score", DoubleType)
  ))
}

/** Typed row of the results contract, for Dataset[T] use. */
case class ShardResult(
    query: Int,
    rank: Int,
    ldocid: Long,
    gdocid: Long,
    score: Double,
    shard: Int,
    bucket: Int)

/** Typed row of a (query, shard, bucket, rank) bucket selection. */
case class BucketSelectionRow(query: Long, shard: Int, bucket: Int, rank: Int)
