package graft

import org.apache.spark.sql.functions._

import graft.operators.ApproxAgg

/** Pins the sketch-based aggregates against their exact oracle-row
  * twins within the documented error bounds (sketch internals differ
  * across engines, so a DuckDB hash oracle cannot see these).
  */
class ApproxAggSuite extends SparkSuite {
  import spark.implicits._

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

  test("heavyHitters: exact answer at sketch cost, any skew, any parallelism") {
    import org.apache.spark.sql.functions._
    // adversarial mix: two true heavy items (30% and 15%), a band of
    // 5% items straddling the 10% threshold, and a long noise tail
    val rnd = new scala.util.Random(31)
    val rows = (Seq.fill(3000)("hot1") ++ Seq.fill(1500)("hot2") ++
      (1 to 8).flatMap(i => Seq.fill(500)(s"mid$i")) ++
      (1 to 1500).map(i => s"noise$i"))
    val df = rnd.shuffle(rows).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "item")
    val total = rows.length.toLong
    def brute(num: Long, den: Long) =
      df.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * den > lit(total) * num)
        .orderBy(col("cnt").desc, col("item").asc)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    for ((num, den) <- Seq((1L, 10L), (1L, 5L), (1L, 25L))) {
      val got = ApproxAgg.heavyHitters(df, col("item"), num, den)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == brute(num, den), s"support $num/$den")
      graft.core.OpCaches.release()
    }
    // identical at a different parallelism: the merge-order-dependent
    // sketch never reaches the output
    val re = ApproxAgg.heavyHitters(df.repartition(13), col("item"), 1L, 10L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(re == brute(1L, 10L))
    graft.core.OpCaches.release()
  }
}
