package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** Recall floors for the REGISTERED ANN configs (SparkEntry), pinned
  * against the exact brute-force top-k on the sf0.01 testdata.
  *
  * The correctness oracles REPLAY each approximation — they judge
  * determinism, not quality — so a knob or codebook regression (a
  * broken centroid sample, a mis-sliced sub-codebook, a probe-list
  * bug) could ship with every hash green. These floors are the
  * quality tripwire: each sits just under the currently measured
  * recall (sf0.01, 32 queries, k=5; see SCALING.md for the full
  * recall-vs-scan curves at sf0.1) so real regressions trip and
  * measurement noise does not. The suite uses more queries (32) than
  * the registered demos (8) for a stabler estimate of the same knobs.
  */
class AnnRecallFloorSuite extends SparkSuite {

  private val dir = sf("sf0.01")
  private lazy val e = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val queries = e.filter(col("vec_id") < 32)

  private lazy val exactTop5: DataFrame = {
    val x = Similarity.cosineTopK(e, queries, 5).select("query_id", "vec_id")
    x.cache(); x.count(); x
  }

  private def recall(approx: DataFrame): Double = {
    val hits = exactTop5.intersect(approx.select("query_id", "vec_id")).count()
    val r = hits.toDouble / exactTop5.count()
    graft.core.OpCaches.release()
    r
  }

  test("registered IVF config (C=64, nprobe=40) holds recall@5 >= 0.9") {
    val r = recall(Similarity.ivfTopK(e, queries, 5, numCentroids = 64, nprobe = 40))
    info(f"ivf_topk recall@5 = $r%.3f")
    assert(r >= 0.9, f"IVF recall@5 regressed: $r%.3f < 0.9")
  }

  test("registered IVF+PQ config (C=64, nprobe=8) holds its measured recall floor") {
    // 0.281 measured at these knobs on the near-uniform testdata —
    // the DOCUMENTED worst case for cell-restricted ADC (SCALING.md):
    // an 8-of-64 probe scans 12.5% of a corpus with no cluster
    // structure to aim at, and the demo knobs deliberately keep the
    // registered query in the steep part of the recall-vs-scan
    // curve. The floor trips a knob/codebook regression, not a data
    // property; the clustered-corpus test below is the quality bar.
    val r = recall(Pq.ivfPqTopK(e, queries, 5, numCentroids = 64, nprobe = 8))
    info(f"ivfpq_topk recall@5 = $r%.3f")
    assert(r >= 0.2, f"IVF+PQ recall@5 regressed: $r%.3f < 0.2")
  }

  test("registered IVF+PQ rerank config (nprobe=8, rerank=50) beats the unrefined scan") {
    val plain = recall(Pq.ivfPqTopK(e, queries, 5, numCentroids = 64, nprobe = 8))
    val r = recall(Pq.ivfPqRerankTopK(e, queries, 5,
      numCentroids = 64, nprobe = 8, rerank = 50))
    info(f"ivfpq_rerank recall@5 = $r%.3f (unrefined $plain%.3f)")
    assert(r >= plain - 1e-9, f"rerank $r%.3f must not lose to unrefined $plain%.3f")
    // 0.794 measured: the refine step recovers most of what ADC
    // ordering loses inside the probed cells; the remaining gap is
    // truth living in unprobed cells (a probe-count property)
    assert(r >= 0.7, f"IVF+PQ rerank recall@5 regressed: $r%.3f < 0.7")
  }

  test("clustered corpus: registered IVF+PQ knob ratios hold recall@5 >= 0.9") {
    // real corpora cluster (the near-uniform testdata is the worst
    // case); on a seeded 10-cluster mixture the same knob RATIOS
    // (probe 1/8 of cells, rerank 50) must clear the quality bar —
    // this is the assertion that catches a real quantizer regression
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10, 64)(rnd.nextGaussian() * 0.5)
    val clustered = (0 until 600).map { i =>
      val c = centers(rnd.nextInt(10))
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq)
    }.toDF("vec_id", "embedding").cache()
    val cq = clustered.filter(col("vec_id") < 32)
    val exactC = Similarity.cosineTopK(clustered, cq, 5)
      .select("query_id", "vec_id").cache()
    val n = exactC.count()
    graft.core.OpCaches.release()
    val approx = Pq.ivfPqRerankTopK(clustered, cq, 5,
      numCentroids = 64, nprobe = 8, rerank = 50)
      .select("query_id", "vec_id")
    val r = exactC.intersect(approx).count().toDouble / n
    info(f"clustered ivfpq_rerank recall@5 = $r%.3f")
    graft.core.OpCaches.release()
    assert(r >= 0.9, f"clustered IVF+PQ rerank recall@5 regressed: $r%.3f < 0.9")
  }

  test("registered two-level IVF config (C=64, s=8/2, nprobe=8) holds its measured floor") {
    // the registered ann_ivf_twolevel knobs: coarse assignment ranks
    // 8 super-centroids and scores only the 2 nearest super-cells'
    // centroids, then an 8-of-64 probe. Until now the two-level path
    // was only OUTPUT-pinned to the joined assignment — this is its
    // quality floor (measured-margin, same convention as the IVF+PQ
    // row above: 8/64 on near-uniform data is the documented steep
    // part of the recall-vs-scan curve).
    val r = recall(Similarity.ivfTopK(e, queries, 5,
      numCentroids = 64, nprobe = 8, superCells = 8, superProbes = 2))
    // 0.575 measured: between plain IVF nprobe=8 ADC-free scoring
    // and the PQ-quantized 0.281 — the coarse restriction costs a
    // little recall vs a flat 8-of-64 probe, the exact scoring wins
    // most of it back
    info(f"ivf_twolevel recall@5 = $r%.3f")
    assert(r >= 0.45, f"two-level IVF recall@5 regressed: $r%.3f < 0.45")
  }

  test("registered knn_join config (A=24, shared>=2) holds its recall floor") {
    // the corpus self-join's candidate blocking is the neardup vote
    // (24 multi-assignments, >= 2 shared cells). Measured 1.000 on
    // the sf0.01 embeddings at these knobs — a 24-wide assignment
    // puts genuinely-nearest pairs in shared cells with near
    // certainty here; the floor sits at 0.9 so a blocking/vote
    // regression trips while sampling noise does not.
    val nn = graft.operators.Similarity.knnJoin(e, 5,
        assignments = 24, minSharedCells = 2)
      .filter(col("vec_id") < 32)
      .select(col("vec_id").as("query_id"), col("neighbor_id").as("vec_id"))
    val r = recall(nn)
    info(f"knn_join recall@5 = $r%.3f")
    assert(r >= 0.9, f"knn_join recall@5 regressed: $r%.3f < 0.9")
  }

  test("full-probe IVF and full-rerank IVF+PQ are exact (recall = 1.0)") {
    val rIvf = recall(Similarity.ivfTopK(e, queries, 5, numCentroids = 64, nprobe = 64))
    assert(rIvf == 1.0, f"full-probe IVF must be exact, got $rIvf%.3f")
    val rPq = recall(Pq.ivfPqRerankTopK(e, queries, 5,
      numCentroids = 64, nprobe = 64, rerank = 500))
    assert(rPq == 1.0, f"full-probe full-rerank IVF+PQ must be exact, got $rPq%.3f")
  }
}
