package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev probe (r15): does the kernel-floor round-robin pay for the
  * tfidf/bm25 corpus tokenize at 1x and 10x corpus size?
  *
  * Both operators run their tokenize+explode+partial-agg inside the
  * scan stage; a sub-maxPartitionBytes parquet is ONE split, so that
  * whole map side runs single-core. The 10x scale run showed tfidf
  * stable at ~5.5x DuckDB — the one exhibit row whose ratio did NOT
  * collapse with scale — which is the single-core-map signature, not
  * a floor artifact. Interleaved variants, rep 0 discarded; run with
  * SPARK_GRAFT_SF_DIR at sf0.1 and at target/scale10.
  */
object TfidfFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = ProbeUtil.benchSession("tfidf-floor-probe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("REPS", "5").toInt
    def docs = Tables.documents(spark, dir)
    def queriesDf = {
      import spark.implicits._
      graft.SparkEntry.Bm25Queries.toDF("query_id", "term")
    }

    def sortedDoc(df: DataFrame): DataFrame =
      graft.core.StaticRange.denseIdSort(df, docs, "doc_id",
        Seq(col("doc_id").asc, col("rank").asc))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "tfidf_nofloor" -> (() => sortedDoc(
        graft.operators.Retrieval.tfidfTopTerms(docs, topK = 3))),
      "tfidf_floor" -> (() => sortedDoc(
        graft.operators.Retrieval.tfidfTopTerms(
          graft.core.Parallelism.kernelFloor(docs), topK = 3))),
      "bm25_nofloor" -> (() =>
        graft.operators.Retrieval.bm25TopK(docs, queriesDf, k = 10)
          .orderBy("query_id", "rank")),
      "bm25_floor" -> (() =>
        graft.operators.Retrieval.bm25TopK(
          graft.core.Parallelism.kernelFloor(docs), queriesDf, k = 10)
          .orderBy("query_id", "rank")))

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
      println(f"PROBE $dir $n%-16s med=${ProbeUtil.median(ts)}%.3f  (${ts.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
