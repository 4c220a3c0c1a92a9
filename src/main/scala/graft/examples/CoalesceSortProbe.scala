package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev probe (round 13): the bounded presentation sort's exchange.
  *
  * `repartition(1).sortWithinPartitions` guarantees the single
  * partition with a SHUFFLE — under AQE that is one more query-stage
  * round (materialize + re-plan + schedule, 40-95 ms at toy scale:
  * JobGapProbe). `coalesce(1).sortWithinPartitions` reaches the same
  * single partition NARROWLY — no exchange, no stage round — at the
  * price of collapsing the whole post-shuffle segment to one task.
  * For frames whose last exchange-to-output segment is a trivial
  * final aggregation over a bounded group count (the |Q| x k ANN
  * lists, the |Q| x |S| selection reports), that segment is
  * single-task-sized by contract, so the narrow merge should win;
  * for segments holding real work (the c2 arrival walk) it would
  * serialize the operator and must NOT be used.
  */
object CoalesceSortProbe {
  import ProbeUtil.median

  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("coalesce-sort-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt

    def repart(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(keys: _*)
    def coal(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame =
      df.coalesce(1).sortWithinPartitions(keys: _*)

    def annPrebuilt = {
      val e = Tables.embeddings(spark, dir)
      graft.operators.Similarity.ivfTopKPrebuilt(e, s"$dir/embeddings.parquet",
        e.filter(col("vec_id") < 8), 5)
    }
    def annFitted = {
      val e = Tables.embeddings(spark, dir)
      graft.operators.Pq.pqTopK(e, e.filter(col("vec_id") < 8), 5,
        codebooks = Some(graft.PinnedCodebook.FittedPq))
    }
    def annIvf = {
      val e = Tables.embeddings(spark, dir)
      graft.operators.Similarity.ivfTopK(e, e.filter(col("vec_id") < 8), 5,
        numCentroids = 64, nprobe = 8)
    }
    def a4 = Tables.selection(spark, dir)
    def q1 = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))

    val tk = Seq(col("query_id"), col("rank"))
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "ann_prebuilt rep" -> (() => repart(annPrebuilt, tk: _*)),
      "ann_prebuilt coal" -> (() => coal(annPrebuilt, tk: _*)),
      "ann_fitted rep" -> (() => repart(annFitted, tk: _*)),
      "ann_fitted coal" -> (() => coal(annFitted, tk: _*)),
      "ann_ivf rep" -> (() => repart(annIvf, tk: _*)),
      "ann_ivf coal" -> (() => coal(annIvf, tk: _*)),
      "a4 rep" -> (() => repart(a4, col("query"), col("shard"))),
      "a4 coal" -> (() => coal(a4, col("query"), col("shard"))),
      "q1 rep" -> (() => repart(q1, col("l_returnflag"), col("l_linestatus"))),
      "q1 coal" -> (() => coal(q1, col("l_returnflag"), col("l_linestatus"))))

    spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    def run(df: => DataFrame): Double = {
      graft.core.OpCaches.release()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      variants.foreach { case (name, mk) => times(name) :+= run(mk()) }
    }
    variants.foreach { case (name, _) =>
      val ts = times(name)
      println(f"$name%-18s ${median(ts)}%.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
