package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dev probe: lm_perplexity cost decomposition and score-side
  * variants, interleaved under the bench session conf (round 13).
  *
  * Variants:
  *  - registered: the live row (per-occurrence quantized log)
  *  - q_premodel: quantized log-probability precomputed ONCE PER
  *    MODEL ENTRY (50k logs) instead of once per corpus occurrence
  *    (~1M logs at sf0.1) — identical values, the floor/log runs on
  *    the same integers
  *  - q_pre_rebal: q_premodel + the SCORE side's corpus scan
  *    round-robin rebalanced (the model build side untouched)
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("lm-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run(mk: => DataFrame): Double = {
      graft.core.OpCaches.release(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def bigramsOf(ws: org.apache.spark.sql.Column) =
      when(size(ws) >= 2,
        transform(sequence(lit(1), size(ws) - 1),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
        .otherwise(array())

    def docs = graft.Tables.documents(spark, dir)
    def registered = graft.SparkEntry.queries("lm_perplexity")(spark, dir)

    def scored(rebal: Boolean): DataFrame = {
      val (lm, vocabDf) = graft.operators.Lm.bigramLmPlan(
        docs.filter(col("doc_id") % 7 === 3))
      val v = col("__vocab")
      // fold the quantized log INTO the model rows (and V + qunk into
      // the one-row frame): the corpus side then only probes and sums
      val lmq = lm.crossJoin(broadcast(vocabDf))
        .select(col("s"),
          floor(lit(1e9) * log((col("c_ab") + lit(1L)).cast("double") /
            (col("c_a") + v).cast("double"))).cast("long").as("q"))
      val unk = vocabDf.select(
        floor(lit(1e9) * log(lit(1.0) / v.cast("double"))).cast("long").as("qunk"))
      val base0 = docs.select(col("doc_id"), col("text"))
      val base = if (rebal) base0.repartition(32) else base0
      base
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ws"))
        .select(col("doc_id"), explode(bigramsOf(col("ws"))).as("s"))
        .crossJoin(broadcast(unk))
        .join(broadcast(lmq), Seq("s"), "left")
        .select(col("doc_id"), coalesce(col("q"), col("qunk")).as("q"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("qsum"))
        .select(col("doc_id"), col("n_bigrams"),
          (-(col("qsum").cast("double") / lit(1e9)) / col("n_bigrams")).as("nll"))
        .orderBy("doc_id")
    }

    for (rep <- 1 to 4) {
      println(f"registered     ${run(registered)}%.2f")
      println(f"q_premodel     ${run(scored(rebal = false))}%.2f")
      println(f"q_pre_rebal    ${run(scored(rebal = true))}%.2f")
    }
    // sanity: variant outputs equal the registered row's
    val a = registered.collect().map(_.toSeq).toSeq
    val b = scored(rebal = false).collect().map(_.toSeq).toSeq
    val c = scored(rebal = true).collect().map(_.toSeq).toSeq
    println(s"EQUAL premodel=${a == b} rebal=${a == c}")
    spark.stop()
  }
}
