package graft

import org.apache.spark.sql.functions._

import graft.operators.ApproxAgg

/** Pins the sketch-based aggregates against their exact oracle-row
  * twins within the documented error bounds (sketch internals differ
  * across engines, so a DuckDB hash oracle cannot see these).
  */
class ApproxAggSuite extends SparkSuite {

  test("approx_percentile within rank-error bound of exact percentile") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val approx = ApproxAgg.approxPercentiles(
      li, Seq("l_returnflag"), "l_quantity", Seq(0.5, 0.9), accuracy = 10000)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.keySet == exact.keySet)
    // rank error <= n/accuracy; l_quantity is integers 1..50, ~uniform,
    // so ~n/50 rows per value -> a k-rank error moves the value by
    // <= ceil(k / (n/50)) = 1 for n >= 10k, plus 0.5 for the exact
    // form's interpolation between adjacent integers
    approx.foreach { case (k, ps) =>
      val (p50, p90, n) = exact(k)
      val rankErr = n.toDouble / 10000
      val valueSlack = math.ceil(rankErr / (n / 50.0)) + 0.5
      assert(math.abs(ps(0) - p50) <= valueSlack, s"$k p50: ${ps(0)} vs $p50")
      assert(math.abs(ps(1) - p90) <= valueSlack, s"$k p90: ${ps(1)} vs $p90")
    }
  }

  test("approx_count_distinct within 3*rsd of exact countDistinct") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = ApproxAgg.approxDistinct(
      li, Seq("l_returnflag"), Seq("l_suppkey", "l_partkey"), rsd = 0.05)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (as, ap)) =>
      val (es, ep) = exact(k)
      assert(math.abs(as - es).toDouble / es <= 0.15, s"$k supp: $as vs $es")
      assert(math.abs(ap - ep).toDouble / ep <= 0.15, s"$k part: $ap vs $ep")
    }
  }

  test("approx sketches do partial (map-side) aggregation") {
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val p1 = ApproxAgg.approxPercentiles(
      li, Seq("l_returnflag"), "l_quantity", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(p1.contains("partial_percentile_approx"), p1.take(2000))
    val p2 = ApproxAgg.approxDistinct(li, Seq("l_returnflag"), Seq("l_suppkey"))
      .queryExecution.executedPlan.toString
    assert(p2.contains("partial_approx_count_distinct"), p2.take(2000))
  }
}
