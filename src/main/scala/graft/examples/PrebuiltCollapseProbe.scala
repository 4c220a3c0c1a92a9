package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serving-path scale probe for the r19 prebuilt v2 collapsed
  * indexes: on the 100× replica corpora, the RAW stored indexes
  * reproduce the copy-quadratic probe the inline forms escaped in
  * r18 — |new-in-bucket| × bucket size (text bands) and batch copies
  * × corpus copies per shared cell (embedding) — while the collapsed
  * v2 indexes band/assign DISTINCT content only and expand
  * output-proportionally.
  *
  * Measures, per corpus, a production-shaped ingest batch (the %5
  * id slice — 20 batch copies vs 80 corpus copies of every
  * replicated item) served through BOTH routes (endpoint dupGates;
  * the index builds run untimed first), plus the routed default.
  * Numbers land in SCALING.md.
  *
  * Usage: runMain graft.examples.PrebuiltCollapseProbe \
  *   [textDir] [embDir] [reps]   (defaults target/scale100,
  *   target/emb100, 2; pass "skip" to skip a side)
  */
object PrebuiltCollapseProbe {
  def main(args: Array[String]): Unit = {
    val textDir = if (args.nonEmpty) args(0) else "target/scale100"
    val embDir = if (args.length > 1) args(1) else "target/emb100"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = ProbeUtil.benchSession("PrebuiltCollapseProbe")

    def time(label: String)(mk: => DataFrame): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = mk
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.OpCaches.release()
        spark.sharedState.cacheManager.clearCache()
        dt
      }
      val m = ProbeUtil.median(ts)
      println(f"$label%-44s $m%8.2f s   (reps ${ts.map(t => f"$t%.2f").mkString(" ")})")
      m
    }

    if (textDir != "skip") {
      val docs = spark.read.parquet(s"$textDir/documents.parquet")
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      val path = s"$textDir/documents.parquet"
      def serve(gate: Double) =
        graft.operators.Dedup.incrementalMinHashCandidatesPrebuilt(
          corpus, path, batch, variant = "probe5", dupGate = gate)
      // untimed index builds (raw + collapsed + route entries)
      println(s"[text $textDir] building store entries (untimed)")
      serve(1.0).limit(1).count(); graft.core.OpCaches.release()
      serve(-1.0).limit(1).count(); graft.core.OpCaches.release()
      graft.operators.Dedup.storedDupFraction(corpus, path, "text",
        "doc_id", "probe5", force = false)
      time("text raw-index serving (dupGate>=1)")(serve(1.0))
      time("text collapsed-v2 serving (dupGate<0)")(serve(-1.0))
      time("text routed default gate")(serve(
        graft.operators.Dedup.DefaultDupGate))
    }

    if (embDir != "skip") {
      val e = spark.read.parquet(s"$embDir/embeddings.parquet")
      val corpus = e.filter(col("vec_id") % 5 =!= 0)
      val batch = e.filter(col("vec_id") % 5 === 0)
      val path = s"$embDir/embeddings.parquet"
      def serve(gate: Double) =
        graft.operators.Similarity.ivfNearDupBatchPrebuilt(
          corpus, path, batch, threshold = 0.3,
          assignments = 24, minSharedCells = 2, variant = "probe5",
          dupGate = gate)
      println(s"[emb $embDir] building store entries (untimed)")
      serve(-1.0).limit(1).count(); graft.core.OpCaches.release()
      time("emb collapsed-v2 serving (dupGate<0)")(serve(-1.0))
      time("emb routed default gate")(serve(
        graft.operators.Dedup.DefaultDupGate))
      // raw route LAST (it may be the slow one; its index build is
      // untimed here too)
      serve(1.0).limit(1).count(); graft.core.OpCaches.release()
      time("emb raw-index serving (dupGate>=1)")(serve(1.0))
    }
    println("PREBUILT_COLLAPSE_OK")
    spark.stop()
  }
}
