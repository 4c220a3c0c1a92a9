package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Measures ANN recall of the IVF operators against the exact
  * brute-force baseline on the testdata embeddings — the numbers
  * recorded in SCALING.md. Run:
  *
  *   sbt "runMain graft.examples.AnnRecall /root/testdata/sf0.1"
  *
  * recall@5 = |ivf top-5 ∩ exact top-5| / (5 x queries); the scan
  * fraction is the share of (query, corpus) pairs the probe set
  * actually scores — the cost knob the recall buys with.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-ann-recall")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, sfDir)
    val nCorpus = e.count()
    val nq = math.min(200L, nCorpus / 2)
    val queries = e.filter(col("vec_id") < nq)

    val exact = Similarity.cosineTopK(e, queries, 5)
      .select("query_id", "vec_id").cache()
    val exactN = exact.count()

    println(s"corpus=$nCorpus queries=$nq exact_top5_rows=$exactN")
    for ((c, p) <- Seq((64, 8), (64, 16), (64, 24), (64, 32), (64, 40), (64, 48))) {
      graft.core.OpCaches.release(); spark.catalog.clearCache(); exact.cache(); exact.count()
      val approx = Similarity.ivfTopK(e, queries, 5, numCentroids = c, nprobe = p)
        .select("query_id", "vec_id")
      val hits = exact.intersect(approx).count()
      println(f"ivf_topk C=$c nprobe=$p recall@5=${hits.toDouble / exactN}%.3f " +
        f"scan_frac=${p.toDouble / c}%.3f")
    }

    // two-level assignment: S supers, P probed super-cells — recall
    // cost of the ~2 sqrt(C) per-vector assignment vs flat C dots
    for ((s2, p2) <- Seq((8, 1), (8, 2), (8, 4))) {
      graft.core.OpCaches.release(); spark.catalog.clearCache(); exact.cache(); exact.count()
      val approx = Similarity.ivfTopK(e, queries, 5, numCentroids = 64,
        nprobe = 40, superCells = s2, superProbes = p2)
        .select("query_id", "vec_id")
      val hits = exact.intersect(approx).count()
      println(f"ivf_topk_twolevel C=64 nprobe=40 S=$s2 P=$p2 " +
        f"recall@5=${hits.toDouble / exactN}%.3f")
    }

    // near-dup pair recall: truth = exact all-pairs at the threshold
    val prep = Similarity.prepared(e, "embedding", "vec_id")
      .persist()
    val truth = prep.select(col("vec_id").as("id_a"), col("v").as("va"), col("n2").as("na2"))
      .join(prep.select(col("vec_id").as("id_b"), col("v").as("vb"), col("n2").as("nb2")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosineQ(Similarity.dotQ(col("va"), col("vb")),
          col("na2"), col("nb2")).as("cosine"))
      .filter(col("cosine") >= 0.3)
      .select("id_a", "id_b").cache()
    val nTruth = truth.count()
    println(s"exact_pairs_ge_0.3=$nTruth")
    // C = 0 means autoCentroids(n) (sqrt growth law); minShared is the
    // >=k-shared-cells candidate vote; S > 0 switches to two-level
    // assignment with S supers / 2 probed super-cells. clearCache
    // between iterations: each call holds its own MEMORY_AND_DISK
    // projection otherwise.
    val sAuto = math.ceil(math.sqrt(
      Similarity.autoCentroids(nCorpus).toDouble)).toInt
    for ((c, a, m, s2) <- Seq((64, 8, 1, 0), (0, 16, 2, 0), (0, 20, 2, 0),
        (0, 24, 2, 0), (0, 24, 3, 0), (0, 24, 2, sAuto))) {
      graft.core.OpCaches.release(); spark.catalog.clearCache(); truth.cache(); truth.count()
      val t0 = System.nanoTime()
      val got = Similarity.ivfNearDupPairs(e, threshold = 0.3,
        numCentroids = c, assignments = a, minSharedCells = m,
        superCells = s2, superProbes = 2)
        .select("id_a", "id_b").cache()
      val nGot = got.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val hits = truth.intersect(got).count()
      println(f"ivf_neardup C=$c A=$a M=$m S=$s2 recall=${hits.toDouble / nTruth}%.3f " +
        f"pairs=$nGot time=$secs%.2fs")
    }

    // --- k-means|| vs lowest-id sample on a CLUSTERED corpus ---------
    // The testdata embeddings are near-uniform (the sample's best
    // case); real corpora cluster, where a fitted quantizer probes
    // fewer wrong cells. Seeded synthetic mixture: 25 Gaussian
    // clusters in 64-dim.
    import spark.implicits._
    graft.core.OpCaches.release(); spark.catalog.clearCache()
    val rnd = new scala.util.Random(7)
    val kTrue = 25
    val centers = Array.fill(kTrue, 64)(rnd.nextGaussian() * 0.5)
    val clustered = (0 until 2000).map { i =>
      val c = centers(rnd.nextInt(kTrue))
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq)
    }.toDF("vec_id", "embedding").cache()
    val cq = clustered.filter(col("vec_id") < 200)
    val exactC = Similarity.cosineTopK(clustered, cq, 5)
      .select("query_id", "vec_id").cache()
    val exactCN = exactC.count()
    println(s"clustered_corpus=2000 k_true=$kTrue exact_top5_rows=$exactCN")
    val cp2 = Similarity.prepared(clustered, "embedding", "vec_id").cache()
    val km = graft.operators.KMeans.kmeansCentroids(cp2, 64).cache()
    km.count()
    for (p <- Seq(4, 8, 16)) {
      val sampleHits = exactC.intersect(
        Similarity.ivfTopK(clustered, cq, 5, numCentroids = 64, nprobe = p)
          .select("query_id", "vec_id")).count()
      val kmHits = exactC.intersect(
        Similarity.ivfTopK(clustered, cq, 5, nprobe = p,
          centroids = Some(km)).select("query_id", "vec_id")).count()
      println(f"clustered C=64 nprobe=$p recall@5 sample=${sampleHits.toDouble / exactCN}%.3f " +
        f"kmeans=${kmHits.toDouble / exactCN}%.3f")
    }

    // two-level assignment on the clustered corpus — where coarse
    // structure exists for the super-cells to capture (the uniform
    // corpus is its documented worst case)
    for ((s2, p2) <- Seq((8, 2), (8, 4))) {
      val hits = exactC.intersect(
        Similarity.ivfTopK(clustered, cq, 5, numCentroids = 64, nprobe = 16,
          superCells = s2, superProbes = p2)
          .select("query_id", "vec_id")).count()
      println(f"clustered_twolevel C=64 nprobe=16 S=$s2 P=$p2 " +
        f"recall@5=${hits.toDouble / exactCN}%.3f")
    }

    // near-dup on the clustered corpus: sample vs k-means quantizer
    val truthC = cp2.select(col("vec_id").as("id_a"), col("v").as("va"), col("n2").as("na2"))
      .join(cp2.select(col("vec_id").as("id_b"), col("v").as("vb"), col("n2").as("nb2")))
      .filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosineQ(Similarity.dotQ(col("va"), col("vb")),
        col("na2"), col("nb2")) >= 0.9)
      .select("id_a", "id_b").cache()
    val nTruthC = truthC.count()
    println(s"clustered_exact_pairs_ge_0.9=$nTruthC")
    val kmAuto = graft.operators.KMeans.kmeansCentroids(
      cp2, Similarity.autoCentroids(2000)).cache()
    kmAuto.count()
    for ((label, cent) <- Seq(
        ("sample", None), ("kmeans", Some(kmAuto))
      ): Seq[(String, Option[org.apache.spark.sql.DataFrame])]) {
      val got = Similarity.ivfNearDupPairs(clustered, threshold = 0.9,
        centroids = cent).select("id_a", "id_b")
      val hits = truthC.intersect(got).count()
      println(f"clustered_neardup A=16 M=2 $label recall=${hits.toDouble / nTruthC}%.3f")
    }
    spark.stop()
  }
}
