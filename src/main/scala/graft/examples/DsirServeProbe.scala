package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev probe (r15): where does the dsir_weights_prebuilt serving row
  * spend its time, and which batch-scoring shape is fastest once the
  * model is memoized driver-side?
  *
  * Variants (all scoring the doc_id%5==0 batch under the pinned model
  * of the rest, then denseIdSort + noop — the registered row's
  * shape):
  *  - explode_kf:    kernelFloor + explode + literal probe + hash agg
  *                   (the r14 registered form)
  *  - explode_nokf:  same without the kernel-floor exchange
  *  - rowlocal_kf:   kernelFloor + the rowScore fold (map-only — no
  *                   agg exchange at all)
  *  - rowlocal_nokf: rowScore fold straight off the scan
  *  - *_noaqe:       best shapes under the AQE-off bounded session
  * Interleaved rounds, rep 0 discarded (store build + memo warm).
  */
object DsirServeProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("dsir-serve-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("REPS", "5").toInt
    def docs = Tables.documents(spark, dir)
    def corpus = docs.filter(col("doc_id") % 5 =!= 0)
    def batch = docs.filter(col("doc_id") % 5 === 0)
    val buckets = 8192

    def model(): Array[Long] = graft.operators.Dsir.storedModelSelf(
      corpus, s"$dir/documents.parquet", col("lang") === "en",
      variant = "holdout5-en")

    def explodeScore(b: DataFrame, qArr: Array[Long], kf: Boolean): DataFrame = {
      val src = if (kf) graft.core.Parallelism.kernelFloor(b) else b
      src.select(col("doc_id"), explode(
          graft.functions.TokenizeFunctions.ws_ngram_features(col("text"), 2)).as("f"))
        .select(col("doc_id"), element_at(typedLit(qArr.toSeq),
          (graft.functions.HashFunctions.md5_pair(col("f")).getItem(0) % buckets
            + lit(1L)).cast("int")).as("q"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_feats"), sum(col("q")).as("qsum"))
        .select(col("doc_id"), col("n_feats"),
          (col("qsum").cast("double") / lit(1e9)).as("logweight"))
    }

    def rowlocalScore(b: DataFrame, qArr: Array[Long], kf: Boolean): DataFrame = {
      val src = if (kf) graft.core.Parallelism.kernelFloor(b) else b
      src.select(col("doc_id"),
          graft.operators.Dsir.rowScore(col("text"), qArr, buckets).as("sc"))
        .filter(col("sc.n_feats") >= 1)
        .select(col("doc_id"), col("sc.n_feats").as("n_feats"),
          (col("sc.qsum").cast("double") / lit(1e9)).as("logweight"))
    }

    def sorted(df: DataFrame, src: DataFrame): DataFrame =
      graft.core.StaticRange.denseIdSort(df, src, "doc_id",
        Seq(col("doc_id").asc))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "explode_kf" -> (() => sorted(explodeScore(batch, model(), kf = true), docs)),
      "explode_nokf" -> (() => sorted(explodeScore(batch, model(), kf = false), docs)),
      "rowlocal_kf" -> (() => sorted(rowlocalScore(batch, model(), kf = true), docs)),
      "rowlocal_nokf" -> (() => sorted(rowlocalScore(batch, model(), kf = false), docs)),
      "registered" -> (() => sorted(
        graft.operators.Dsir.scoreBatchPrebuilt(
          corpus, s"$dir/documents.parquet", batch, col("lang") === "en",
          variant = "holdout5-en"), docs)),
      "explode_kf_noaqe" -> (() => {
        val s2 = graft.core.SessionTuning.boundedPlan(spark)
        val d2 = Tables.documents(s2, dir)
        sorted(explodeScore(d2.filter(col("doc_id") % 5 === 0), model(), kf = true), d2)
      }),
      "rowlocal_kf_noaqe" -> (() => {
        val s2 = graft.core.SessionTuning.boundedPlan(spark)
        val d2 = Tables.documents(s2, dir)
        sorted(rowlocalScore(d2.filter(col("doc_id") % 5 === 0), model(), kf = true), d2)
      }))

    val onlyV = sys.env.get("VARIANTS").map(_.split(",").map(_.trim).toSet)
    val chosen = variants.filter { case (n, _) => onlyV.forall(_.contains(n)) }
    val times = collection.mutable.Map[String, Vector[Double]]()
    for (r <- 0 to rounds; (n, mk) <- chosen) {
      graft.core.OpCaches.release(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      if (r > 0) times(n) = times.getOrElse(n, Vector.empty) :+ t
    }
    chosen.foreach { case (n, _) =>
      val ts = times(n)
      println(f"PROBE $n%-20s med=${ProbeUtil.median(ts)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
