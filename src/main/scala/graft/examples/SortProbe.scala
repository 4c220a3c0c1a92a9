package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.PlanBridge

/** Dev probe: cost of each registered query's FINAL global sort — the
  * range-exchange sampling pass re-executes whatever sits beneath the
  * sort that is not behind a materialized shuffle/broadcast, so a
  * query whose expensive work is map-only under the sort pays it
  * twice. Times each named query as registered vs with the top-level
  * Sort node stripped from the analyzed plan; the delta is what a
  * sorted-first/cheaper-sort rewrite could recover (minus the
  * sort's own work).
  */
object SortProbe {
  import ProbeUtil.median

  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("sort-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("t2_group_head", "c2_evaluate", "c8_select_buckets",
        "asof_events", "u1_union_all", "c6_select", "bm25_topk",
        "lm_perplexity", "sessionize_batch")
    val reps = 5
    for (name <- names) {
      val mk = graft.SparkEntry.queries(name)
      // mode 0 = as registered; 1 = top Sort stripped; 2 = child
      // lazily localCheckpoint'ed then re-sorted (one computation of
      // the child shared by the sampling pass and the sort); 3 =
      // single-partition sort (no sampling job — only valid as a
      // plan choice when the output is presentation-bounded)
      def run(mode: Int): Double = {
        graft.core.OpCaches.release()
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        val df = mk(spark, dir)
        val target = df.queryExecution.analyzed match {
          case s: org.apache.spark.sql.catalyst.plans.logical.Sort if mode > 0 =>
            val child = PlanBridge.ofRows(spark, s.child)
            if (mode == 1) child
            else if (mode == 3)
              PlanBridge.ofRows(spark,
                org.apache.spark.sql.catalyst.plans.logical.Sort(
                  s.order, global = false,
                  org.apache.spark.sql.catalyst.plans.logical.Repartition(
                    1, shuffle = true, child.queryExecution.analyzed)))
            else {
              val lc = child.localCheckpoint(eager = false)
              PlanBridge.ofRows(spark,
                org.apache.spark.sql.catalyst.plans.logical.Sort(
                  s.order, s.global, lc.queryExecution.analyzed))
            }
          case _ => df
        }
        target.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // sanity: all three modes must produce the same row multiset
      def rowsOf(mode: Int): Long = {
        val df = mk(spark, dir)
        val t = df.queryExecution.analyzed match {
          case s: org.apache.spark.sql.catalyst.plans.logical.Sort if mode > 0 =>
            val child = PlanBridge.ofRows(spark, s.child)
            if (mode == 1) child
            else {
              val lc = child.localCheckpoint(eager = false)
              PlanBridge.ofRows(spark,
                org.apache.spark.sql.catalyst.plans.logical.Sort(
                  s.order, s.global, lc.queryExecution.analyzed))
            }
          case _ => df
        }
        t.count()
      }
      val counts = (0 to 2).map(rowsOf)
      require(counts.distinct.size == 1, s"$name row counts diverge: $counts")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      (0 to 3).foreach(run) // warm all
      val trips = (1 to reps).map { _ =>
        val t = (run(0), run(1), run(2), run(3))
        // drop finished checkpoint blocks so later reps recompute
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        t
      }
      val s = median(trips.map(_._1)); val n = median(trips.map(_._2))
      val l = median(trips.map(_._3)); val sp = median(trips.map(_._4))
      println(f"$name%-22s sorted ${s}%.3f  stripped ${n}%.3f  lc+sort ${l}%.3f  1part ${sp}%.3f")
    }
    spark.stop()
  }
}
