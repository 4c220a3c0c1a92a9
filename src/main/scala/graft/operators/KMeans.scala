package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded, deterministic k-means|| coarse quantizer for the IVF
  * operators (Bahmani et al., "Scalable k-means++", VLDB 2012).
  *
  * Produces centroids through the same (cent_id, cv, cn2) contract as
  * `Similarity.centroidSample`, so it swaps into `ivfTopK` /
  * `ivfNearDupPairs` via their `centroids` parameter. The registered
  * oracle-checked queries keep the deterministic lowest-id sample
  * (a SQL oracle can rebuild that index; rebuilding a k-means fit in
  * SQL is not practical) — this is the quality path for clustered
  * corpora, measured against the sample in SCALING.md.
  *
  * Determinism without RNG state on executors:
  * - every "random" draw is a pure function of (seed, vec id) via
  *   xxhash64, so sampling decisions are stable under any partitioning
  *   or retry;
  * - distributed reductions are exact integer sums (quantized
  *   vectors), so Lloyd updates don't depend on float reduction order;
  * - the final weighted k-means++ reduction of the oversampled
  *   candidate set runs on the driver (candidates are O(l * rounds),
  *   a few hundred rows) with a seeded JVM RNG.
  *
  * Scale shape: each round is one broadcast of the current candidate
  * set + one corpus scan (distance-to-nearest via the codegen'd
  * dot_long kernel); nothing wider than (id, d2) ever shuffles, and
  * the Lloyd update ships one (cent_id, component-sum) row per
  * (cell, dimension) thanks to map-side partial aggregation.
  */
object KMeans {

  import graft.functions.VectorFunctions.dot_long

  /** Squared L2 distance between quantized vectors via exact integer
    * parts: |a|^2 + |b|^2 - 2<a,b>.
    */
  private def d2(va: org.apache.spark.sql.Column, na2: org.apache.spark.sql.Column,
      vb: org.apache.spark.sql.Column, nb2: org.apache.spark.sql.Column) =
    na2 + nb2 - lit(2L) * dot_long(va, vb)

  /** min_{c in cent} d2(x, c) for every corpus row; cent is broadcast.
    * Returns (idCol, v, n2, best_d2).
    */
  private def minD2(cp: DataFrame, cent: Seq[(Array[Long], Long)],
      idCol: String): DataFrame = {
    val spark = cp.sparkSession
    import spark.implicits._
    val centDf = broadcast(cent.toDF("cv", "cn2"))
    cp.crossJoin(centDf)
      .groupBy(col(idCol), col("v"), col("n2"))
      .agg(min(d2(col("v"), col("n2"), col("cv"), col("cn2"))).as("best_d2"))
  }

  /** Uniform-in-[0,1) pure function of (seed, id): the top 53 bits of
    * xxhash64 — the per-point "coin" for the oversampling rounds.
    */
  private def coin(idc: org.apache.spark.sql.Column, seed: Long) =
    (shiftrightunsigned(xxhash64(lit(seed), idc), 11).cast("double") /
      lit((1L << 53).toDouble))

  /** k-means|| centroids over a prepared corpus (`Similarity.prepared`
    * output: idCol, v, n2). Returns (cent_id, cv, cn2) with cent_id =
    * 0..k-1 in a deterministic order.
    *
    * @param rounds  oversampling rounds (the paper's ~5 suffice)
    * @param factor  oversampling factor l = factor * k per round
    * @param iters   Lloyd refinement iterations after init
    */
  def kmeansCentroids(cp: DataFrame, k: Int, idCol: String = "vec_id",
      seed: Long = 42L, rounds: Int = 5, factor: Int = 2,
      iters: Int = 5): DataFrame = {
    val spark = cp.sparkSession
    import spark.implicits._
    require(k >= 1)

    def collectVecs(df: DataFrame): Seq[(Array[Long], Long)] =
      df.select(col("v"), col("n2")).collect().toSeq
        .map(r => (r.getSeq[Long](0).toArray, r.getLong(1)))

    // --- init round 0: the vector with the smallest (hash, id) ---
    val first = collectVecs(
      cp.withColumn("__h", xxhash64(lit(seed), col(idCol)))
        .orderBy(col("__h"), col(idCol)).limit(1))
    var candidates: Seq[(Array[Long], Long)] = first
    val l = factor.toLong * k

    // --- k-means|| oversampling: P(pick x) = min(1, l * d2 / phi) ---
    for (r <- 1 to rounds) {
      val dists = minD2(cp, candidates, idCol)
      val phi = dists.agg(sum(col("best_d2"))).as[Long].head()
      if (phi > 0) {
        val picked = collectVecs(
          dists.filter(
            coin(col(idCol), seed + r) * lit(phi.toDouble) <
              lit(l.toDouble) * col("best_d2")))
        candidates = candidates ++ picked
      }
    }

    // --- weight candidates by |nearest points|, reduce to k on the
    // --- driver with seeded weighted k-means++ ---
    val candDf = broadcast(candidates.toDF("cv", "cn2")
      .withColumn("cand_id", monotonically_increasing_id()))
    // deterministic argmin: smallest d2, then smallest cand_id
    val weights = cp.crossJoin(candDf)
      .withColumn("d2c", d2(col("v"), col("n2"), col("cv"), col("cn2")))
      .groupBy(col(idCol))
      .agg(min(struct(col("d2c"), col("cand_id"))).as("best"))
      .groupBy(col("best.cand_id").as("cand_id"))
      .agg(count(lit(1)).as("w"))
    val weighted = candDf.join(weights, Seq("cand_id"), "left")
      .na.fill(0L, Seq("w"))
      .orderBy(col("cand_id"))
      .collect().toSeq
      .map(r => (r.getSeq[Long](1).toArray, r.getLong(2), r.getLong(3)))

    val centers = weightedKMeansPlusPlus(weighted, k, seed)

    // --- Lloyd refinement, fully distributed: the assignment is the
    // --- same broadcast-join argmin; the update aggregates exact
    // --- integer component sums per (cell, dimension) — map-side
    // --- partial, one (cent_id, pos) row each — and rebuilds each
    // --- centroid array IN the engine (sorted collect_list of C x dim
    // --- tiny structs), so the driver never materializes the
    // --- assignment and the fit composes with sqrt-law centroid
    // --- counts. floor(x + 0.5) is bit-for-bit Math.round, keeping
    // --- results identical to the earlier driver-side form; empty
    // --- cells keep their centroid via the left join. Each round
    // --- localCheckpoints (eager) — iterative plans otherwise nest
    // --- and re-analyze exponentially.
    var centDf = centers.zipWithIndex
      .map { case (cv, i) => (i, cv, cv.map(x => x * x).sum) }
      .toDF("cent_id", "cv", "cn2")
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = cp.crossJoin(broadcast(centDf))
        .withColumn("d2c", d2(col("v"), col("n2"), col("cv"), col("cn2")))
        .groupBy(col(idCol), col("v"))
        .agg(min(struct(col("d2c"), col("cent_id"))).as("best"))
        .select(col("best.cent_id").as("cent_id"), col("v"))
      val sums = assigned
        .select(col("cent_id"), posexplode(col("v")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      val updated = sums.groupBy(col("cent_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("s"), col("n")))),
          x => floor(x.getField("s").cast("double") / x.getField("n") + 0.5)
            .cast("long")).as("cv2"))
      centDf = centDf.join(updated, Seq("cent_id"), "left")
        .select(col("cent_id"), coalesce(col("cv2"), col("cv")).as("cv"))
        .withColumn("cn2", aggregate(col("cv"), lit(0L), (a, x) => a + x * x))
        .localCheckpoint()
    }
    centDf
  }

  /** Weighted k-means++ on the driver (Arthur & Vassilvitskii 2007,
    * weighted form): picks k of the candidate (vector, n2, weight)
    * rows, D^2-weighted, with a seeded RNG. Deterministic given
    * (candidates order, seed).
    */
  private[operators] def weightedKMeansPlusPlus(
      cand: Seq[(Array[Long], Long, Long)], k: Int,
      seed: Long): IndexedSeq[Array[Long]] = {
    val rnd = new scala.util.Random(seed)
    val n = cand.size
    if (n <= k) return cand.map(_._1).toIndexedSeq
    def dd(a: Array[Long], b: Array[Long]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = (a(i) - b(i)).toDouble; s += d * d; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer[Array[Long]]()
    // first: weight-proportional draw
    val totalW = cand.map(_._3.toDouble).sum.max(1.0)
    var t = rnd.nextDouble() * totalW
    var idx = 0
    while (idx < n - 1 && t > cand(idx)._3.toDouble) { t -= cand(idx)._3; idx += 1 }
    chosen += cand(idx)._1
    val best = Array.fill(n)(Double.MaxValue)
    while (chosen.size < k) {
      var i = 0
      while (i < n) {
        val d = dd(cand(i)._1, chosen.last)
        if (d < best(i)) best(i) = d
        i += 1
      }
      val total = cand.indices.map(i => best(i) * cand(i)._3).sum
      if (total <= 0) {
        // all mass on chosen points: fill with the heaviest unchosen
        val left = cand.indices
          .filterNot(i => chosen.exists(c => c.sameElements(cand(i)._1)))
          .sortBy(i => -cand(i)._3)
        left.take(k - chosen.size).foreach(i => chosen += cand(i)._1)
      } else {
        var t2 = rnd.nextDouble() * total
        var j = 0
        while (j < n - 1 && t2 > best(j) * cand(j)._3) { t2 -= best(j) * cand(j)._3; j += 1 }
        chosen += cand(j)._1
      }
    }
    chosen.toIndexedSeq
  }
}
