package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Sinks

/** Driver-contract smoke: `entry` must return rows; partitioned sink
  * must produce a prunable layout.
  */
class EntrySuite extends SparkSuite {

  test("entry returns a non-empty flagship result") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("query") && df.columns.contains("score"))
  }

  test("every query has an oracle unless declared rows-only; no oracle is orphaned") {
    // the only queries allowed to lack an oracle are the declared
    // approximate-by-design sketches (rows-only driver check +
    // exact-form error-bound pins in ApproxAggSuite)
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet ==
      SparkEntry.rowsOnlyQueries)
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
    assert((SparkEntry.rowsOnlyQueries -- SparkEntry.queries.keySet).isEmpty)
  }

  test("bucketed tables sort-merge-join with no exchange and no sort") {
    Sinks.writeBucketed(
      Tables.lineitem(spark, sf("sf0.001"))
        .select("l_orderkey", "l_quantity"), "li_b", Seq("l_orderkey"), 8)
    Sinks.writeBucketed(
      Tables.orders(spark, sf("sf0.001"))
        .select("o_orderkey", "o_totalprice"), "ord_b", Seq("o_orderkey"), 8)
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n${plan.take(2000)}")
  }

  test("writePartitioned lays out hive-style prunable directories") {
    val out = Files.createTempDirectory("graft-sink").toString + "/part"
    Sinks.writePartitioned(
      Tables.results(spark, sf("sf0.001")), out, Seq("query"))
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("query="))
    assert(dirs.length == Tables.NumQueries)
    // partition pruning: a query=3 filter must read only that directory
    val pruned = spark.read.parquet(out).filter(col("query") === 3)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(query"), scan.take(1500))
    assert(pruned.count() > 0)
  }
}
