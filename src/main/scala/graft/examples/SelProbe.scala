package graft.examples

import org.apache.spark.sql.functions._
import graft.Tables
import graft.selectivesearch.SelectiveSearch

/** Dev probe: c6_select / c7_select_decay cost decomposition and the
  * materialize-below-sort lever. The final orderBy's range exchange
  * samples its child first, re-executing everything beneath that is
  * not already behind a shuffle/broadcast — for the selection
  * pipelines that child is the results scan + broadcast join, so the
  * 600k-row lineitem projection scans TWICE per run. Variant B
  * inserts a hash repartition below the sort: the extra exchange
  * materializes the join output as a query stage, and the sampling
  * pass re-reads shuffle files instead of re-running the scan+join.
  */
object SelProbe {
  import ProbeUtil.median

  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("sel-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt

    def run(df: => org.apache.spark.sql.DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def c6 = SelectiveSearch.select(
      Tables.selection(spark, dir), Tables.results(spark, dir), 2)
    def c6unsorted = {
      val top = Tables.selection(spark, dir)
        .filter(col("rank") < lit(2)).select("query", "shard")
      Tables.results(spark, dir).join(broadcast(top), Seq("query", "shard"))
    }
    def c6mat = c6unsorted
      .repartition(col("query"))
      .orderBy(col("query").asc, col("score").desc,
        col("shard").asc, col("bucket").asc, col("gdocid").asc)
    def c7 = SelectiveSearch.selectWithDecay(
      Tables.selection(spark, dir), Tables.results(spark, dir), 3, 0.5)

    // Variant C: coalesce(1) between the bounded (|Q| x |S|) selection
    // aggregate and its rank window — the single-partition child
    // satisfies the window's ClusteredDistribution statically, so the
    // window's exchange disappears from the plan (2 -> 1 exchanges on
    // the broadcast side).
    def c6coal = {
      import org.apache.spark.sql.expressions.Window
      val agg = Tables.lineitem(spark, dir)
        .groupBy(
          (col("l_orderkey") % Tables.NumQueries).cast("int").as("query"),
          (col("l_suppkey") % Tables.NumShards).cast("int").as("shard"))
        .agg(sum(col("l_quantity")).as("mass"))
        .coalesce(1)
      val w = Window.partitionBy(col("query"))
        .orderBy(col("mass").desc, col("shard").asc)
      val sel = agg.withColumn("rank", (row_number().over(w) - 1).cast("int"))
      SelectiveSearch.select(sel, Tables.results(spark, dir), 2)
    }

    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "c6 registered" -> (() => c6),
      "c6 unsorted" -> (() => c6unsorted),
      "c6 repart+sort" -> (() => c6mat),
      "c6 coal-window" -> (() => c6coal),
      "c7 registered" -> (() => c7))

    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, mk) => times(name) :+= run(mk()) }
    }
    variants.foreach { case (name, _) =>
      val ts = times(name)
      println(f"$name%-16s ${median(ts)}%.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
