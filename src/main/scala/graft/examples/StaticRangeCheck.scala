package graft.examples

import org.apache.spark.sql.functions._

/** Dev scratch check for StaticRange: output order equals orderBy. */
object StaticRangeCheck {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("static-range-check")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val r = graft.Tables.results(spark, dir)
    val sortCols = Seq(col("query").asc, col("score").desc,
      col("shard").asc, col("bucket").asc, col("gdocid").asc)
    val a = r.orderBy(sortCols: _*).collect()
    val b = graft.core.StaticRange.sortByKnownDomain(
      r, col("query"), graft.Tables.NumQueries, sortCols).collect()
    println(s"rows ${a.length} vs ${b.length}; equal=${a.toSeq == b.toSeq}")
    // physical plan: no sampling possible — print for inspection
    graft.core.StaticRange.sortByKnownDomain(
      r, col("query"), graft.Tables.NumQueries, sortCols).explain()
    spark.stop()
  }
}
