package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding search — the MEMORY-side
  * scale path beside IVF's compute-side one (Jégou, Douze & Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * The vector space splits into `m` subspaces; each subspace gets a
  * small codebook, and every vector is stored as `m` small codes —
  * 4 bytes here versus 256+ for the raw vector, the difference
  * between an embedding index that fits executor memory at 10^10
  * vectors and one that does not. Queries score documents with
  * asymmetric distance computation (ADC): one exact distance TABLE
  * per (query, subspace, code) — |Q| x m x ksub longs, collected once
  * and shipped as task-local literal arrays (the faiss in-cache-table
  * shape) — then every document's distance is m integer array lookups
  * summed map-side, never a touch of the raw corpus vector.
  *
  * Codebook: the sub-vectors of the `ksub` lowest-id vectors — the
  * same deterministic, SQL-rebuildable convention as the IVF centroid
  * sample, so the whole pipeline is hash-exact against a relational
  * oracle. A fitted k-means sub-codebook (per subspace, via
  * [[KMeans]]) slots through the same (subspace, code, entry)
  * contract when quantization quality matters more than oracle
  * replay; codebook quality changes recall, not the operator's shape.
  *
  * Numerics: all distances are exact integer L2 on the quantized
  * (×1000) vectors — argmin ties break on the lower code index,
  * ranking ties on the lower vector id, so results are deterministic
  * at any parallelism and engine.
  *
  * Scale shape: the codebook is m x ksub sub-vectors — driver-side
  * tiny at any corpus size; encoding is one projection over the
  * corpus with m x ksub native integer dot products per row (no
  * shuffle, no join); the ADC scan computes every (doc, query)
  * distance map-side, so the ONLY exchange in the whole scan is the
  * bounded top-k partial aggregation (<= k rows per query per task).
  * Nothing wider than the m-byte code array persists per document.
  */
object Pq {

  /** Driver-side codebook: `codebook(s)(j)` = the j-th entry of
    * subspace s, taken from the `ksub` lowest-id vectors' quantized
    * sub-slices (deterministic; mirrors the IVF centroid-sample
    * convention).
    */
  def codebook(corpus: DataFrame, m: Int, ksub: Int,
      embCol: String = "embedding", idCol: String = "vec_id"): Array[Array[Array[Long]]] =
    codebookFromPrep(Similarity.prepared(corpus, embCol, idCol), m, ksub, idCol)

  /** Fitted sub-codebooks: per-subspace k-means (seeded,
    * deterministic, exact-integer — [[KMeans.kmeansCentroids]]) over
    * the corpus's sub-vector slices. Same return contract as
    * [[codebook]], so it swaps into [[encode]]/[[pqTopK]] unchanged —
    * the quality path when quantization distortion matters more than
    * SQL-oracle replay (registered queries keep the sample codebook
    * the oracle can rebuild). Entry order is cent_id-ascending:
    * deterministic at any parallelism.
    *
    * Each subspace returns the BETTER of the k-means fit and the
    * sample codebook's entries by exact total distortion (ties
    * prefer the fit). k-means|| init is not seeded from the sample,
    * so Lloyd iterations only guarantee improvement over their own
    * init — without this guard, "fitted beats sample" would be an
    * empirical property of a particular data/seed pair; with it, the
    * bound the `ann_pq_fitted_bounds` audit row pins is an invariant
    * of construction. A fit should never ship worse than the trivial
    * baseline anyway.
    */
  def kmeansCodebook(corpus: DataFrame, m: Int, ksub: Int,
      embCol: String = "embedding", idCol: String = "vec_id",
      seed: Long = 42L): Array[Array[Array[Long]]] = {
    // null prepared vectors dropped up front so BOTH fit branches see
    // the same frame: a null `v` NPE'd the driver-fit probe and would
    // null out the distributed branch's distortion sums — a null
    // vector cannot inform a codebook on any path
    val prep = Similarity.prepared(corpus, embCol, idCol)
      .filter(col("v").isNotNull)
      .transform(graft.core.OpCaches.persistTracked)
    // size-gated driver fit (KMeans.driverKmeans, the bit-for-bit
    // mirror of the distributed loop): ONE collect serves all m
    // subspace fits — sub-slices, sub-norms, and the best-of
    // distortion compare are driver arithmetic. Over the gate (or a
    // non-bigint id), each subspace runs the distributed loop on its
    // sliced projection and the compare is one extra corpus pass.
    val gate = KMeans.DefaultDriverMaxFitVectors
    val probe =
      if (prep.schema(idCol).dataType == org.apache.spark.sql.types.LongType)
        prep.select(col(idCol), col("v")).limit(gate.toInt + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (probe.nonEmpty && probe.length <= gate) {
      val rows = probe.map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1)
      val dim = rows(0)._2.length
      require(dim % m == 0, s"m=$m must divide dim=$dim")
      val sub = dim / m
      (0 until m).map { s =>
        val subRows = rows.map { case (id, v) =>
          val sv = v.slice(s * sub, s * sub + sub)
          (id, sv, sv.map(x => x * x).sum)
        }
        val fitted = KMeans.driverKmeans(subRows, ksub, seed + s,
          rounds = 5, factor = 2, iters = 5).toArray
        val sample = rows.take(ksub)
          .map(_._2.slice(s * sub, s * sub + sub))
        def distortion(entries: Array[Array[Long]]): Long =
          subRows.foldLeft(0L) { case (acc, (_, sv, _)) =>
            Math.addExact(acc, entries.iterator.map { e =>
              var d = 0L; var i = 0
              while (i < sv.length) {
                val t = sv(i) - e(i); d += t * t; i += 1
              }
              d
            }.min)
          }
        if (distortion(fitted) <= distortion(sample)) fitted else sample
      }.toArray
    } else {
      // loud require, not head()'s NoSuchElementException, when the
      // corpus is empty — a codebook cannot be fit on zero vectors
      val dimRow = prep.select(size(col("v"))).head(1)
      require(dimRow.nonEmpty, "cannot fit a PQ codebook: empty corpus")
      val dim = dimRow(0).getInt(0)
      require(dim % m == 0, s"m=$m must divide dim=$dim")
      val sub = dim / m
      val sample = codebookFromPrep(prep, m, ksub, idCol)
      val fitted = (0 until m).map { s =>
        val sp = prep.select(col(idCol), slice(col("v"), s * sub + 1, sub).as("v"))
          .withColumn("n2", Similarity.norm2Q(col("v")))
        KMeans.kmeansCentroids(sp, ksub, idCol, seed = seed + s)
          .orderBy(col("cent_id"))
          .select(col("cv")).collect().map(_.getSeq[Long](0).toArray)
      }.toArray
      // per-subspace distortions of BOTH codebooks in ONE corpus
      // pass (the codebookDistortions shape, kept per-subspace so the
      // best-of can mix)
      val dCols = (0 until m).flatMap { s =>
        Seq(nearestDistCol(fitted(s), s, sub).cast("decimal(38,0)").as(s"__f$s"),
          nearestDistCol(sample(s), s, sub).cast("decimal(38,0)").as(s"__p$s"))
      }
      val r = prep.select(dCols: _*)
        .agg(sum(col("__f0")), (0 until m).flatMap(s =>
          (if (s == 0) Nil else Seq(sum(col(s"__f$s")))) :+
            sum(col(s"__p$s"))): _*)
        .head()
      (0 until m).map { s =>
        val dFit = r.getDecimal(2 * s)
        val dSample = r.getDecimal(2 * s + 1)
        require(dFit != null && dSample != null,
          s"subspace $s distortion sum is NULL — decimal overflow?")
        if (dFit.compareTo(dSample) <= 0) fitted(s) else sample(s)
      }.toArray
    }
  }

  private[operators] def codebookFromPrep(prep: DataFrame, m: Int,
      ksub: Int, idCol: String): Array[Array[Array[Long]]] =
    // nulls filtered BEFORE the limit — the low-id sample is the
    // lowest ksub NON-NULL vectors on every path (centroidSample's
    // definition); filtering after the limit would both NPE here and
    // shrink the sample
    codebookFromVecs(prep.filter(col("v").isNotNull)
      .orderBy(col(idCol)).limit(ksub)
      .select(col("v")).collect()
      .map(_.getSeq[Long](0).toArray).toSeq, m)

  /** The codebook slicing on already-collected vectors (the `ksub`
    * lowest-id rows, id-ascending).
    */
  private def codebookFromVecs(rows: Seq[Array[Long]],
      m: Int): Array[Array[Array[Long]]] = {
    require(rows.nonEmpty, "empty corpus — no codebook")
    val dim = rows(0).length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    Array.tabulate(m, rows.length)((s, j) => rows(j).slice(s * sub, s * sub + sub))
  }

  /** Exact integer L2 distance from this row's subspace-`s` slice of
    * `v` to its nearest entry — the per-row distortion term, shared
    * by [[codebookDistortions]] and [[kmeansCodebook]]'s best-of.
    */
  private def nearestDistCol(entries: Array[Array[Long]], s: Int,
      sub: Int): Column = {
    val vs = slice(col("v"), s * sub + 1, sub)
    val vn2 = Similarity.dotQ(vs, vs)
    val cands = entries.toSeq.map { e =>
      val en2 = e.map(x => x * x).sum
      vn2 + lit(en2) - lit(2L) * Similarity.dotQ(vs, lit(e))
    }
    if (cands.size == 1) cands.head else least(cands: _*)
  }

  /** (idCol, codes) — `codes(s)` = index of the nearest codebook entry
    * of subspace s by exact integer L2, ties to the lower index.
    * Expansion (a-b)² = a²+b²-2ab keeps every per-entry distance a
    * native codegen'd [[graft.functions.VectorFunctions.dot_long]]
    * instead of an interpreted higher-order zip.
    */
  def encode(prep: DataFrame, cb: Array[Array[Array[Long]]],
      idCol: String = "vec_id", cellCol: Option[Column] = None): DataFrame = {
    // r21: one fused-kernel expression per row instead of m
    // least(struct(d, j)) chains over ksub entries each — the chains'
    // expression tree was the other half of the PQ rows' per-call
    // Catalyst + Janino tax (R21GapProf; see litNearestCells). The
    // kernel computes the identical |v_s|² + |e|² − 2·v_s·e integer
    // expansion with ties to the lower j, so codes are bit-equal.
    // cellCol (an expression over the prep's v/n2, e.g. the fused
    // nearest-cells kernel) still FUSES the IVF cell assignment into
    // the same single projection — one corpus pass, no assignment join
    val cell = cellCol.map(_.as("cent_id")).toSeq
    // kernelFloor (r21): the encode is m x ksub x sub dots per row
    // fused into the consumer's map stage — single-task over a
    // one-split corpus scan without it (see nearestCentroidsFromRows)
    graft.core.Parallelism.kernelFloor(prep).select(col(idCol) +:
      graft.functions.VectorFunctions.pq_encode(col("v"), cb).as("codes") +:
      cell: _*)
  }

  /** Total exact-integer quantization distortion of a codebook over
    * the corpus: Σ_rows Σ_s min_j ||v_s − cb(s)(j)||² on the
    * quantized (×1000) vectors — the objective the k-means fit
    * minimizes, and therefore the right axis to COMPARE codebooks on
    * (top-k recall on a handful of queries is noise by comparison).
    * One map-side corpus pass, one scalar aggregate; deterministic at
    * any parallelism (integer sum).
    */
  def codebookDistortion(corpus: DataFrame, cb: Array[Array[Array[Long]]],
      embCol: String = "embedding", idCol: String = "vec_id"): Long =
    codebookDistortions(corpus, Seq(cb), embCol, idCol).head

  /** [[codebookDistortion]] for several codebooks in ONE corpus pass
    * (one projection, one scalar aggregate) — the comparison shape:
    * scans don't repeat per codebook.
    */
  def codebookDistortions(corpus: DataFrame, cbs: Seq[Array[Array[Array[Long]]]],
      embCol: String = "embedding", idCol: String = "vec_id"): Seq[Long] = {
    require(cbs.nonEmpty, "no codebooks to score")
    val prep = Similarity.prepared(corpus, embCol, idCol)
    val dCols = cbs.zipWithIndex.map { case (cb, i) =>
      val m = cb.length
      val sub = cb(0)(0).length
      (0 until m).map(s => nearestDistCol(cb(s), s, sub))
        .reduce(_ + _).as(s"__d$i")
    }
    // decimal aggregate: a plain sum(long) wraps SILENTLY past ~2^63
    // total distortion (reachable around 10^8-10^9 rows of
    // wide-component embeddings — inside this module's target scale)
    // and would invert the codebook comparison with no error; the
    // decimal sum is exact and order-free, and longValueExact turns a
    // genuinely out-of-range total into a loud failure instead.
    // count + dim ride the same aggregate row (no extra job): count
    // distinguishes an empty corpus (NULL sum, legitimately 0) from a
    // non-ANSI decimal-overflow NULL, and dim catches a codebook whose
    // m x sub doesn't match the corpus (slicing past the end yields
    // short arrays and a plausible-but-meaningless distortion).
    val r = prep.select(dCols :+ size(col("v")).as("__dim"): _*)
      .agg(sum(col("__d0").cast("decimal(38,0)")),
        cbs.indices.tail.map(i => sum(col(s"__d$i").cast("decimal(38,0)"))) ++
          Seq(count(lit(1)).as("__n"), max(col("__dim")).as("__maxdim")): _*)
      .head()
    val n = r.getLong(cbs.size)
    if (n > 0) {
      val dim = r.getInt(cbs.size + 1)
      cbs.zipWithIndex.foreach { case (cb, i) =>
        val cbDim = cb.length * cb(0)(0).length
        require(cbDim == dim,
          s"codebook $i covers $cbDim dims (m=${cb.length} x sub=${cb(0)(0).length}) but the corpus has $dim")
      }
    }
    cbs.indices.map { i =>
      if (r.isNullAt(i)) {
        require(n == 0,
          s"distortion sum $i is NULL over $n rows — decimal overflow?")
        0L
      } else r.getDecimal(i).toBigInteger.longValueExact()
    }
  }

  /** ADC distance table for every query row: (query_id, s, j, d) with
    * d = exact integer L2 between the query's subspace-s slice and
    * codebook entry j.
    */
  private def distTable(qprep: DataFrame, cb: Array[Array[Array[Long]]],
      idCol: String): DataFrame = {
    val m = cb.length
    val sub = cb(0)(0).length
    val entries = (0 until m).flatMap { s =>
      val vs = slice(col("v"), s * sub + 1, sub)
      val vn2 = Similarity.dotQ(vs, vs)
      cb(s).indices.map { j =>
        val e = cb(s)(j)
        val en2 = e.map(x => x * x).sum
        struct(lit(s).as("s"), lit(j).as("j"),
          (vn2 + lit(en2) - lit(2L) * Similarity.dotQ(vs, lit(e))).as("d"))
      }
    }
    qprep.select(col(idCol).as("query_id"), explode(array(entries: _*)).as("e"))
      .select(col("query_id"), col("e.s").as("s"), col("e.j").as("j"), col("e.d").as("d"))
  }

  /** PQ-ADC top-k: every document scored as the sum of its m table
    * lookups (full PQ scan — compose with an IVF cell filter for
    * IVF+PQ), ranked (distance asc, id asc), self-matches excluded.
    * Returns (query_id, rank, vec_id, pq_dist).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 4, ksub: Int = 16,
      embCol: String = "embedding", idCol: String = "vec_id",
      codebooks: Option[Array[Array[Array[Long]]]] = None,
      chunkSize: Int = MaxLiteralQueries): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    // prep feeds the codebook collect (a limit-ksub TakeOrdered — one
    // cheap pass) and the encode projection (one full pass); NOT
    // cached deliberately — persisting the full quantized-vector
    // projection is exactly what doesn't fit at corpus scale, and the
    // two passes never co-execute
    val prep = Similarity.prepared(corpus, embCol, idCol)
    // the two index-build collects (query rows, codebook sample) are
    // independent driver jobs over different frames — submit the
    // query collect concurrently so the build pays ONE round of job
    // latency, not two (results are collects, so overlap cannot
    // affect determinism)
    val qrowsB = buildCollect(queries)(Similarity.collectVecRows(
      Similarity.prepared(queries, embCol, idCol), idCol))
    val cb = withBuild(qrowsB)(
      codebooks.getOrElse(codebookFromPrep(prep, m, ksub, idCol)))
    val codes = encode(prep, cb, idCol)
    // ADC tables from one tiny query-set collect + driver arithmetic
    // (exact integers — identical to the relational distTable form)
    val dt = driverDistTables(qrowsB.await(), cb)
    // the faiss shape, relationally: ADC tables live as task-local
    // literal arrays (|Q| x m x ksub longs — driver/closure-tiny),
    // pq_dist is computed MAP-SIDE per (doc, query), and the only
    // exchange in the whole scan is the bounded top-k partial
    // aggregation (<= k rows per query per task)
    finishAdc(adcFullScan(codes, dt, idCol, chunkSize), k, idCol)
  }

  /** Full-scan ADC over a code frame: every (doc, query) pair scored
    * map-side from the literal distance tables; the only exchange is
    * the bounded top-k that follows. Shared by [[pqTopK]] and the
    * served-from-store [[pqTopKFromIndex]]. Empty query set -> empty
    * frame of the right schema (grouped() yields no chunks).
    */
  private def adcFullScan(codes: DataFrame,
      dt: Seq[(Long, Array[Array[Long]])], idCol: String,
      chunkSize: Int): DataFrame =
    if (dt.isEmpty)
      codes.select(lit(0L).as("query_id"), col(idCol),
        lit(0L).as("pq_dist")).filter(lit(false))
    else dt.grouped(chunkSize).map { chunk =>
      val qScores = chunk.map { case (qid, tab) =>
        struct(lit(qid).as("query_id"), lookupDist(tab).as("pq_dist"))
      }
      codes
        .select(col(idCol), explode(array(qScores: _*)).as("q"))
        .select(col("q.query_id").as("query_id"), col(idCol),
          col("q.pq_dist").as("pq_dist"))
        .filter(col("query_id") =!= col(idCol))
    }.reduce(_.unionByName(_))

  /** The plain-PQ code frame (idCol, codes) under the sample
    * codebook — the stored artifact for build-once/query-many
    * full-scan ADC serving.
    */
  def pqIndex(corpus: DataFrame, m: Int = 4, ksub: Int = 16,
      embCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val prep = Similarity.prepared(corpus, embCol, idCol)
    graft.core.IndexMeta.tag(
      encode(prep, codebookFromPrep(prep, m, ksub, idCol), idCol),
      "codes", "kind" -> "pq", "m" -> m, "ksub" -> ksub,
      "embCol" -> embCol, "idCol" -> idCol)
  }

  /** [[pqIndex]] behind the metadata-versioned store. */
  def storedPqIndex(corpus: DataFrame, corpusPath: String,
      m: Int = 4, ksub: Int = 16,
      embCol: String = "embedding", idCol: String = "vec_id",
      force: Boolean = false): DataFrame = {
    // v3: bumped with the r19 codebook-sample null filter — see
    // Similarity.storedIvfIndex's v3 note
    val name = s"pq-m$m-k$ksub-$embCol-$idCol-v3-" +
      graft.core.IndexStore.md5hex(corpusPath)
    graft.core.IndexStore.readOrBuild(corpus.sparkSession, name,
      graft.core.IndexStore.sourceFingerprint(corpusPath), force)(
      pqIndex(corpus, m, ksub, embCol, idCol))
  }

  /** The full-scan ADC query phase against a stored code frame: the
    * per-call work is the codebook-sample and query collects
    * (overlapped) plus the scan over index bytes — zero corpus-wide
    * encode passes per query. Output-identical to [[pqTopK]]: the
    * sample codebook is a deterministic function of the corpus, so
    * stored codes and the re-derived distance tables agree.
    */
  def pqTopKFromIndex(index: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int, m: Int = 4, ksub: Int = 16,
      embCol: String = "embedding", idCol: String = "vec_id",
      chunkSize: Int = MaxLiteralQueries): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    graft.core.IndexMeta.validate(index, "codes", "pqTopKFromIndex",
      "kind" -> "pq", "m" -> m, "ksub" -> ksub,
      "embCol" -> embCol, "idCol" -> idCol)
    val prep = Similarity.prepared(corpus, embCol, idCol)
    val qrowsB = buildCollect(queries)(Similarity.collectVecRows(
      Similarity.prepared(queries, embCol, idCol), idCol))
    val cb = withBuild(qrowsB)(codebookFromPrep(prep, m, ksub, idCol))
    val dt = driverDistTables(qrowsB.await(), cb)
    finishAdc(adcFullScan(index, dt, idCol, chunkSize), k, idCol)
  }

  /** [[pqTopK]] served from the stored code frame — the
    * build-once/query-many shape. The codebook sample comes from the
    * stored low-id rows ([[Similarity.storedPreparedSample]]), so
    * steady-state serving reads index bytes plus a ksub-row frame and
    * never scans the source corpus.
    */
  def pqTopKPrebuilt(corpus: DataFrame, corpusPath: String,
      queries: DataFrame, k: Int, m: Int = 4, ksub: Int = 16,
      embCol: String = "embedding", idCol: String = "vec_id",
      chunkSize: Int = MaxLiteralQueries): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val index = storedPqIndex(corpus, corpusPath, m, ksub, embCol, idCol)
    graft.core.IndexMeta.validate(index, "codes", "pqTopKPrebuilt",
      "kind" -> "pq", "m" -> m, "ksub" -> ksub,
      "embCol" -> embCol, "idCol" -> idCol)
    val sample = Similarity.storedPreparedSample(corpus, corpusPath, ksub,
      embCol, idCol)
    val qrowsB = buildCollect(queries)(Similarity.collectVecRows(
      Similarity.prepared(queries, embCol, idCol), idCol))
    val cb = withBuild(qrowsB)(codebookFromVecs(
      Similarity.collectVecRows(sample, idCol).take(ksub).map(_.v).toSeq, m))
    val dt = driverDistTables(qrowsB.await(), cb)
    finishAdc(adcFullScan(index, dt, idCol, chunkSize), k, idCol)
  }

  /** The code frame under a caller-PINNED codebook (a fit artifact
    * such as [[graft.PinnedCodebook.FittedPq]]), behind the store.
    * The entry name carries an md5 of the codebook entries as its
    * variant key — two different pinned codebooks over the same
    * corpus file must never share an entry (the corpus-frame
    * collision lesson: the store fingerprint tracks the FILE only).
    */
  private def codebookVariant(cb: Array[Array[Array[Long]]]): String =
    graft.core.IndexStore.md5hex(
      cb.map(_.map(_.mkString(",")).mkString(";")).mkString("|"))

  def storedPinnedPqIndex(corpus: DataFrame, corpusPath: String,
      cb: Array[Array[Array[Long]]],
      embCol: String = "embedding", idCol: String = "vec_id",
      force: Boolean = false): DataFrame = {
    val variant = codebookVariant(cb)
    val name = s"pqpinned-$variant-$embCol-$idCol-v1-" +
      graft.core.IndexStore.md5hex(corpusPath)
    graft.core.IndexStore.readOrBuild(corpus.sparkSession, name,
      graft.core.IndexStore.sourceFingerprint(corpusPath), force)(
      graft.core.IndexMeta.tag(
        encode(Similarity.prepared(corpus, embCol, idCol), cb, idCol),
        "codes", "kind" -> "pqpinned", "cb" -> variant,
        "m" -> cb.length, "ksub" -> cb(0).length,
        "embCol" -> embCol, "idCol" -> idCol))
  }

  /** [[pqTopK]] with a pinned codebook, served from the stored code
    * frame — the fitted-PQ serving shape. Per-call work is ONE
    * query-set collect plus the ADC scan over index bytes: the
    * distance tables are driver arithmetic against the literal
    * codebook (no sample read, no codebook job, no corpus encode
    * pass — those are build-time, amortized across queries).
    * Output-identical to `pqTopK(codebooks = Some(cb))`
    * (SimilaritySuite pins it): the stored codes are the same
    * deterministic encode under the same constant.
    */
  def pqTopKPinnedPrebuilt(corpus: DataFrame, corpusPath: String,
      queries: DataFrame, k: Int, cb: Array[Array[Array[Long]]],
      embCol: String = "embedding", idCol: String = "vec_id",
      chunkSize: Int = MaxLiteralQueries): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val index = storedPinnedPqIndex(corpus, corpusPath, cb, embCol, idCol)
    graft.core.IndexMeta.validate(index, "codes", "pqTopKPinnedPrebuilt",
      "kind" -> "pqpinned", "cb" -> codebookVariant(cb),
      "m" -> cb.length, "ksub" -> cb(0).length,
      "embCol" -> embCol, "idCol" -> idCol)
    val qrows = Similarity.collectVecRows(
      Similarity.prepared(queries, embCol, idCol), idCol)
    val dt = driverDistTables(qrows, cb)
    finishAdc(adcFullScan(index, dt, idCol, chunkSize), k, idCol)
  }

  /** Exact-integer ADC sum for one query's tables: m literal-array
    * lookups indexed by the row's code array.
    */
  private def lookupDist(tab: Array[Array[Long]]): Column =
    tab.indices.map(s =>
      element_at(lit(tab(s)), col("codes").getItem(s) + 1)).reduce(_ + _)

  private type BuildCollect[A] = graft.core.Builds.BuildCollect[A]
  private def buildCollect[A](df: DataFrame)(body: => A) =
    graft.core.Builds.buildCollect(df)(body)
  private def withBuild[A, B](b: BuildCollect[A])(main: => B): B =
    graft.core.Builds.withBuild(b)(main)

  /** Chunk size for the literal ADC dispatch: both dispatch shapes
    * are LINEAR in |Q| per candidate row (pqTopK's exploded literal
    * array, ivfPqTopK's nested CASE WHEN chain), and past roughly
    * this many branches whole-stage codegen hits its 64 KB/method
    * limits and falls back to interpreted evaluation — silently, and
    * per-row. Query sets above the bound are therefore dispatched in
    * chunks of this size and unioned before the shared bounded top-k
    * tail: each chunk stays inside codegen, disjoint query ids keep
    * the union's per-query groups intact, and the cost above the
    * bound is one extra candidate-stream pass per chunk — the honest
    * price of leaving the production-ANN regime (queries ≪ corpus),
    * paid instead of thrown.
    */
  val MaxLiteralQueries: Int = 1024

  /** Driver-side ADC tables: query id -> per-subspace distance array
    * (query ids sorted for deterministic plan construction).
    */
  private def collectDistTables(qprep: DataFrame, cb: Array[Array[Array[Long]]],
      idCol: String): Seq[(Long, Array[Array[Long]])] = {
    val m = cb.length
    val ksub = cb(0).length
    // null prepared queries dropped, same boundary contract as
    // Similarity.collectVecRows: a degenerate query gets no table,
    // hence no probes and no rows — the joined paths' behavior
    val tabs = distTable(qprep.filter(col("v").isNotNull), cb, idCol).collect()
      .groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map { case (qid, rows) =>
        val tab = Array.ofDim[Long](m, ksub)
        rows.foreach(r => tab(r.getInt(1))(r.getInt(2)) = r.getLong(3))
        (qid, tab)
      }
    tabs
  }

  /** [[collectDistTables]] computed in driver scala from an
    * already-collected query set — exact integer arithmetic, no
    * additional Spark job. d(q, s, j) = |q_s|² + |e|² - 2 q_s·e over
    * the quantized subspace slices, identical to [[distTable]].
    */
  private def driverDistTables(qrows: Array[Similarity.VecRow],
      cb: Array[Array[Array[Long]]]): Seq[(Long, Array[Array[Long]])] = {
    val m = cb.length
    val ksub = cb(0).length
    val sub = cb(0)(0).length
    qrows.toSeq.sortBy(_.id).map { q =>
      val tab = Array.ofDim[Long](m, ksub)
      var s = 0
      while (s < m) {
        var vn2 = 0L
        var i = 0
        while (i < sub) { val x = q.v(s * sub + i); vn2 += x * x; i += 1 }
        var j = 0
        while (j < ksub) {
          val e = cb(s)(j)
          var en2 = 0L; var d = 0L; i = 0
          while (i < sub) {
            en2 += e(i) * e(i); d += q.v(s * sub + i) * e(i); i += 1
          }
          tab(s)(j) = vn2 + en2 - 2L * d
          j += 1
        }
        s += 1
      }
      (q.id, tab)
    }
  }

  private def finishAdc(scored: DataFrame, k: Int, idCol: String): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKFunctions
        .top_k((-col("pq_dist")).cast("double"), col(idCol), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol),
        (-col("col.score")).cast("long").as("pq_dist"))

  /** IVF+PQ: the ADC scan restricted to each query's `nprobe` nearest
    * IVF cells — the composition that serves 10^10+ vectors: IVF cuts
    * the scanned FRACTION to ~nprobe/C, PQ cuts the BYTES per scanned
    * vector to m codes. Cells and probes use the same centroid-sample
    * convention and (cosine DESC, cent_id) tiebreaks as
    * [[Similarity.ivfTopK]]; each vector lives in exactly one cell and
    * probe cells are distinct, so a (query, doc) candidate appears at
    * most once and ADC sums stay exact. With nprobe = numCentroids the
    * result equals [[pqTopK]] exactly (unit-pinned).
    *
    * Knob note: the literal branch fuses a numCentroids-entry literal
    * argmin into the encode projection, whose generated-code cost
    * grows as numCentroids x dim. The index build checks Similarity's
    * measured LiteralDotBudget once dim is known (post-collect) and
    * assigns cells with the joined heap past it; past the 256-row cap
    * the fully joined index-build shape runs instead.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCentroids: Int = 64, nprobe: Int = 8, m: Int = 4, ksub: Int = 16,
      embCol: String = "embedding", idCol: String = "vec_id",
      chunkSize: Int = MaxLiteralQueries): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    // index build: cache the projection for the build's duration, as
    // ivfTopK does
    val cp = Similarity.prepared(corpus, embCol, idCol)
      .transform(graft.core.OpCaches.persistTracked)
    if (numCentroids <= Similarity.MaxLiteralCentroids) {
      val qrowsB = buildCollect(queries)(Similarity.collectVecRows(
        Similarity.prepared(queries, embCol, idCol), idCol))
      ivfPqLiteral(cp, qrowsB, k, numCentroids, nprobe, m, ksub, idCol,
        chunkSize)
    } else {
      // over-limit centroid table: the joined index-build shape
      val cent = Similarity.centroidSample(cp, numCentroids, idCol)
      val cb = codebookFromPrep(cp, m, ksub, idCol)
      val qprep = Similarity.prepared(queries, embCol, idCol)
      val codes = encode(cp, cb, idCol)
        .join(Similarity.nearestCentroidsJoined(cp, cent, 1, idCol)
          .select(col(idCol), col("cent_id")), Seq(idCol))
      val probes = Similarity.nearestCentroidsJoined(qprep, cent, nprobe, idCol)
        .select(col(idCol).as("__pq"), col("cent_id"))
      adcScan(codes, probes, collectDistTables(qprep, cb, idCol), k, idCol,
        chunkSize)
    }
  }

  /** The literal-regime IVF+PQ scan against an already-collected
    * query set — exactly TWO driver jobs before the scan:
    * (1) one corpus TakeOrdered collect whose lowest-id rows serve
    *     BOTH the centroid table and the codebook sample,
    * (2) the caller's `qrows` collect, from which ADC tables and the
    *     probe list compute in driver scala (exact integer /
    *     bit-identical double ordering).
    * The scan itself is ONE map-side corpus pass: codes and cell id
    * fuse into the encode projection, probes broadcast as a
    * LocalRelation — no assignment join, no agg shuffle. Shared by
    * [[ivfPqTopK]] and [[ivfPqRerankTopK]] (the latter reuses its
    * `qrows` for the refine side too). The two collects are
    * independent jobs, so the caller passes the query collect as an
    * in-flight [[BuildCollect]] and both run concurrently — one round
    * of job latency.
    */
  private def ivfPqLiteral(cp: DataFrame,
      qrowsB: BuildCollect[Array[Similarity.VecRow]],
      k: Int, numCentroids: Int, nprobe: Int, m: Int, ksub: Int,
      idCol: String, chunkSize: Int = MaxLiteralQueries): DataFrame = {
    val (cents, cb) = withBuild(qrowsB) {
      val low = Similarity.collectVecRows(
        cp.filter(col("v").isNotNull)
          .orderBy(col(idCol)).limit(math.max(ksub, numCentroids)), idCol)
      (low.take(numCentroids).map(r => Similarity.CentRow(r.id, r.v, r.n2)),
        codebookFromVecs(low.take(ksub).map(_.v).toSeq, m))
    }
    val qrows = qrowsB.await()
    val dt = driverDistTables(qrows, cb)
    val spark = cp.sparkSession
    import spark.implicits._
    val probes = qrows.toSeq.flatMap(q =>
      Similarity.driverNearestCells(q, cents, nprobe).map(c => (q.id, c)))
      .toDF("__pq", "cent_id")
    // the fused literal cell argmin obeys the same C x dim dot budget
    // as Similarity's assignments (dim is only known post-collect, so
    // the gate lives here, not at the numCentroids branch): past it
    // the joined heap assigns cells — one extra cp pass and join, but
    // no over-budget generated code. Probes stay driver-computed
    // either way (driver arithmetic has no codegen cliff), and both
    // assignment forms are pinned to rank identically.
    val codes =
      if (Similarity.literalEligible(cents))
        encode(cp, cb, idCol, cellCol =
          Some(element_at(Similarity.litNearestCells(cents, 1), 1)))
      else {
        val centDf = cents.toSeq.map(c => (c.id, c.cv.toSeq, c.cn2))
          .toDF("cent_id", "cv", "cn2")
        encode(cp, cb, idCol).join(
          Similarity.nearestCentroidsJoined(cp, centDf, 1, idCol)
            .select(col(idCol), col("cent_id")), Seq(idCol))
      }
    adcScan(codes, probes, dt, k, idCol, chunkSize)
  }

  /** Shared ADC tail: probed candidates score map-side off the literal
    * ADC tables, dispatched on the probing query id — the only
    * exchange is the bounded top-k.
    */
  private def adcScan(codes: DataFrame, probes: DataFrame,
      dt: Seq[(Long, Array[Array[Long]])], k: Int, idCol: String,
      chunkSize: Int = MaxLiteralQueries): DataFrame = {
    val cells = codes.join(broadcast(probes), Seq("cent_id"))
      .filter(col("__pq") =!= col(idCol))
    val chunks = dt.grouped(chunkSize).toSeq
    // empty query set -> empty result of the right schema (no chunks
    // to reduce)
    val scored =
      if (chunks.isEmpty)
        cells.select(col("__pq").as("query_id"), col(idCol),
          lit(0L).as("pq_dist")).filter(lit(false))
      else chunks.map { chunk =>
        // single chunk (the designed regime) sees no extra filter; the
        // over-limit path routes each candidate stream to its chunk's
        // CASE dispatch via an InSet probe on the query id
        val base =
          if (chunks.size == 1) cells
          else cells.filter(col("__pq").isInCollection(chunk.map(_._1)))
        val distByQuery = chunk.foldRight(lit(null).cast("long")) {
          case ((qid, tab), acc) => when(col("__pq") === qid, lookupDist(tab)).otherwise(acc)
        }
        base.select(col("__pq").as("query_id"), col(idCol),
          distByQuery.as("pq_dist"))
      }.reduce(_.unionByName(_))
    finishAdc(scored, k, idCol)
  }

  /** IVF+PQ with exact re-ranking (the "refine" step): the ADC scan
    * nominates each query's `rerank` best candidates by quantized
    * distance, then ONLY those rows fetch their raw vectors for an
    * exact cosine, ranked (cosine desc, id asc) to the final k —
    * the full production ANN shape: IVF bounds the scanned fraction,
    * PQ bounds the scanned bytes, the refine join touches `rerank`
    * vectors per query instead of the corpus. With full probing and
    * `rerank` >= corpus size this EQUALS brute-force
    * [[Similarity.cosineTopK]] exactly (unit-pinned).
    * Returns (query_id, rank, vec_id, cosine).
    *
    * Regime contract: the refine side BROADCASTS the |Q| x rerank
    * nomination list and the |Q| raw query vectors — the production
    * shape where queries ≪ corpus. The ADC nomination itself chunks
    * past `chunkSize` queries (see [[MaxLiteralQueries]]), but a
    * query set large enough to strain an executor broadcast (~10⁶+
    * queries x rerank rows) should batch CALLS to this method
    * instead; the broadcasts below would otherwise fail on Spark's
    * broadcast size limit rather than degrade.
    */
  def ivfPqRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCentroids: Int = 64, nprobe: Int = 8, m: Int = 4, ksub: Int = 16,
      rerank: Int = 100,
      embCol: String = "embedding", idCol: String = "vec_id",
      chunkSize: Int = MaxLiteralQueries): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    require(chunkSize > 0, "chunkSize must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cp = Similarity.prepared(corpus, embCol, idCol)
      .transform(graft.core.OpCaches.persistTracked)
    // literal regime: ONE query collect serves nomination (ADC tables
    // + probes) AND the refine side (qp as a LocalRelation — no
    // second query scan); over-limit centroids fall back to the
    // joined nomination with a scanned qp
    val (cand, qp) =
      if (numCentroids <= Similarity.MaxLiteralCentroids) {
        val qrowsB = buildCollect(queries)(Similarity.collectVecRows(
          Similarity.prepared(queries, embCol, idCol), idCol))
        val nominate = ivfPqLiteral(cp, qrowsB, rerank, numCentroids, nprobe,
          m, ksub, idCol, chunkSize)
        val qrows = qrowsB.await()
        (nominate.select(col("query_id"), col(idCol)),
          qrows.toSeq.map(q => (q.id, q.v.toSeq, q.n2))
            .toDF("query_id", "qv", "qn2"))
      } else {
        (ivfPqTopK(corpus, queries, rerank, numCentroids, nprobe,
            m, ksub, embCol, idCol, chunkSize)
            .select(col("query_id"), col(idCol)),
          Similarity.prepared(queries, embCol, idCol)
            .select(col(idCol).as("query_id"), col("v").as("qv"),
              col("n2").as("qn2")))
      }
    rerankTail(cp, cand, qp, k, idCol)
  }

  /** The exact-refine tail shared by [[ivfPqRerankTopK]] and its
    * prebuilt form: the nomination list is |Q| x rerank rows
    * (query-set-bounded; the ADC dispatch chunks past
    * MaxLiteralQueries but a broadcast this size assumes the
    * production regime of queries ≪ corpus) — BROADCAST it so the
    * refine is a map-side semi-join over the corpus projection, no
    * corpus-sized shuffle between nomination and rerank.
    */
  private def rerankTail(cp: DataFrame, cand: DataFrame, qp: DataFrame,
      k: Int, idCol: String): DataFrame = {
    val exact = cp
      .join(broadcast(cand), Seq(idCol))
      .join(broadcast(qp), Seq("query_id"))
      .select(col("query_id"), col(idCol),
        Similarity.cosineQ(Similarity.dotQ(col("qv"), col("v")),
          col("qn2"), col("n2")).as("cosine"))
    exact.groupBy(col("query_id"))
      .agg(graft.functions.TopKFunctions
        .top_k(col("cosine"), col(idCol), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol),
        col("col.score").as("cosine"))
  }

  /** Build-once IVF+PQ index frame: one row per corpus vector —
    * (idCol, codes, cent_id) — the artifact that persists at corpus
    * scale (m bytes of code + one cell id per vector, ~100x smaller
    * than the raw embeddings). Same centroid-sample/codebook
    * conventions, dot-budget routing, and exact-integer argmin
    * tiebreaks as [[ivfPqTopK]]'s inline build, so a scan over this
    * frame is output-identical to the inline form (suite-pinned).
    */
  def ivfPqIndex(corpus: DataFrame, numCentroids: Int = 64, m: Int = 4,
      ksub: Int = 16, embCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val cp = Similarity.prepared(corpus, embCol, idCol)
      .transform(graft.core.OpCaches.persistTracked)
    val built = if (numCentroids <= Similarity.MaxLiteralCentroids) {
      val low = Similarity.collectVecRows(
        cp.filter(col("v").isNotNull)
          .orderBy(col(idCol)).limit(math.max(ksub, numCentroids)), idCol)
      val cents = low.take(numCentroids)
        .map(r => Similarity.CentRow(r.id, r.v, r.n2))
      val cb = codebookFromVecs(low.take(ksub).map(_.v).toSeq, m)
      if (Similarity.literalEligible(cents))
        encode(cp, cb, idCol, cellCol =
          Some(element_at(Similarity.litNearestCells(cents, 1), 1)))
      else {
        val spark = cp.sparkSession
        import spark.implicits._
        val centDf = cents.toSeq.map(c => (c.id, c.cv.toSeq, c.cn2))
          .toDF("cent_id", "cv", "cn2")
        encode(cp, cb, idCol).join(
          Similarity.nearestCentroidsJoined(cp, centDf, 1, idCol)
            .select(col(idCol), col("cent_id")), Seq(idCol))
      }
    } else {
      val cent = Similarity.centroidSample(cp, numCentroids, idCol)
      val cb = codebookFromPrep(cp, m, ksub, idCol)
      encode(cp, cb, idCol).join(
        Similarity.nearestCentroidsJoined(cp, cent, 1, idCol)
          .select(col(idCol), col("cent_id")), Seq(idCol))
    }
    graft.core.IndexMeta.tag(built, "codes",
      "kind" -> "ivfpq", "numCentroids" -> numCentroids,
      "m" -> m, "ksub" -> ksub, "embCol" -> embCol, "idCol" -> idCol)
  }

  /** [[ivfPqIndex]] kept in the on-disk [[graft.core.IndexStore]],
    * keyed by build parameters and the corpus parquet's metadata
    * fingerprint: built and written on first use (or when the source
    * changed, or when `force` — the honest-build-cost path), read
    * back from the compact artifact otherwise.
    */
  def storedIvfPqIndex(corpus: DataFrame, corpusPath: String,
      numCentroids: Int = 64, m: Int = 4, ksub: Int = 16,
      embCol: String = "embedding", idCol: String = "vec_id",
      force: Boolean = false): DataFrame = {
    // v3: bumped with the r19 centroid/codebook-sample null filter —
    // see Similarity.storedIvfIndex's v3 note
    val name = s"ivfpq-c$numCentroids-m$m-k$ksub-$embCol-$idCol-v3-" +
      graft.core.IndexStore.md5hex(corpusPath)
    graft.core.IndexStore.readOrBuild(corpus.sparkSession, name,
      graft.core.IndexStore.sourceFingerprint(corpusPath), force)(
      ivfPqIndex(corpus, numCentroids, m, ksub, embCol, idCol))
  }

  /** The ADC query phase against an already-built index frame
    * ((idCol, codes, cent_id) — [[ivfPqIndex]] or a store read): the
    * per-call work is the tiny builds only (query collect overlapped
    * with the ksub/numCentroids corpus sample; ADC tables and probes
    * in driver arithmetic) plus the probed-cell scan over index
    * bytes. This is the build-once/query-many serving shape — the
    * corpus-wide encode pass happens zero times per query.
    */
  def ivfPqTopKFromIndex(index: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int,
      numCentroids: Int = 64, nprobe: Int = 8, m: Int = 4, ksub: Int = 16,
      embCol: String = "embedding", idCol: String = "vec_id",
      chunkSize: Int = MaxLiteralQueries): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    graft.core.IndexMeta.validate(index, "codes", "ivfPqTopKFromIndex",
      "kind" -> "ivfpq", "numCentroids" -> numCentroids,
      "m" -> m, "ksub" -> ksub, "embCol" -> embCol, "idCol" -> idCol)
    val cp = Similarity.prepared(corpus, embCol, idCol)
    if (numCentroids <= Similarity.MaxLiteralCentroids) {
      val qrowsB = buildCollect(queries)(Similarity.collectVecRows(
        Similarity.prepared(queries, embCol, idCol), idCol))
      fromIndexLiteral(index, cp, qrowsB, k, numCentroids, nprobe, m, ksub,
        idCol, chunkSize)
    } else {
      val cent = Similarity.centroidSample(cp, numCentroids, idCol)
      val cb = codebookFromPrep(cp, m, ksub, idCol)
      val qprep = Similarity.prepared(queries, embCol, idCol)
      val probes = Similarity.nearestCentroidsJoined(qprep, cent, nprobe, idCol)
        .select(col(idCol).as("__pq"), col("cent_id"))
      adcScan(index, probes, collectDistTables(qprep, cb, idCol), k, idCol,
        chunkSize)
    }
  }

  /** Literal-regime serving against a prebuilt index: mirrors
    * [[ivfPqLiteral]] minus the encode — ONE cheap TakeOrdered over
    * `lowSrc` (centroids + codebook sample; the prepared corpus for
    * hand-held indexes, the stored n-row sample for store-served
    * calls — the latter never scans the corpus) overlapped with the
    * caller's query collect, then driver-computed ADC tables/probes
    * feed the probed scan over the index frame.
    */
  private def fromIndexLiteral(index: DataFrame, lowSrc: DataFrame,
      qrowsB: BuildCollect[Array[Similarity.VecRow]],
      k: Int, numCentroids: Int, nprobe: Int, m: Int, ksub: Int,
      idCol: String, chunkSize: Int): DataFrame = {
    val (cents, cb) = withBuild(qrowsB) {
      val low = Similarity.collectVecRows(
        lowSrc.filter(col("v").isNotNull)
          .orderBy(col(idCol)).limit(math.max(ksub, numCentroids)), idCol)
      (low.take(numCentroids).map(r => Similarity.CentRow(r.id, r.v, r.n2)),
        codebookFromVecs(low.take(ksub).map(_.v).toSeq, m))
    }
    val qrows = qrowsB.await()
    val dt = driverDistTables(qrows, cb)
    val spark = lowSrc.sparkSession
    import spark.implicits._
    val probes = qrows.toSeq.flatMap(q =>
      Similarity.driverNearestCells(q, cents, nprobe).map(c => (q.id, c)))
      .toDF("__pq", "cent_id")
    adcScan(index, probes, dt, k, idCol, chunkSize)
  }

  /** [[ivfPqTopK]] served from the stored index — the registered
    * build-once/query-many pair's query half. Output-identical to the
    * inline form (codes are a deterministic function of the corpus).
    * In the literal regime the centroid/codebook sample comes from
    * the stored low-id rows, so serving never scans the corpus; the
    * over-limit regime falls back to the corpus-deriving
    * [[ivfPqTopKFromIndex]].
    */
  def ivfPqTopKPrebuilt(corpus: DataFrame, corpusPath: String,
      queries: DataFrame, k: Int,
      numCentroids: Int = 64, nprobe: Int = 8, m: Int = 4, ksub: Int = 16,
      embCol: String = "embedding", idCol: String = "vec_id",
      chunkSize: Int = MaxLiteralQueries): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val index = storedIvfPqIndex(corpus, corpusPath, numCentroids, m, ksub,
      embCol, idCol)
    if (numCentroids <= Similarity.MaxLiteralCentroids) {
      graft.core.IndexMeta.validate(index, "codes", "ivfPqTopKPrebuilt",
        "kind" -> "ivfpq", "numCentroids" -> numCentroids,
        "m" -> m, "ksub" -> ksub, "embCol" -> embCol, "idCol" -> idCol)
      val sample = Similarity.storedPreparedSample(corpus, corpusPath,
        math.max(ksub, numCentroids), embCol, idCol)
      val qrowsB = buildCollect(queries)(Similarity.collectVecRows(
        Similarity.prepared(queries, embCol, idCol), idCol))
      fromIndexLiteral(index, sample, qrowsB, k, numCentroids, nprobe, m,
        ksub, idCol, chunkSize)
    } else
      ivfPqTopKFromIndex(index, corpus, queries, k, numCentroids, nprobe,
        m, ksub, embCol, idCol, chunkSize)
  }

  /** [[ivfPqRerankTopK]] served from the stored index: nomination
    * scans index bytes only. The refine then joins the nominated
    * |Q| x rerank ids against the prepared corpus — which in THIS
    * implementation still streams the full corpus projection through
    * a broadcast semi-join (and caches it for the call), i.e. one
    * per-vector pass per serving call. A deployment that needs the
    * candidate-keyed fetch (touch raw bytes per-candidate only)
    * fronts the raw store with a point-lookup table; the join
    * structure here is exactly that shape, the storage isn't.
    */
  def ivfPqRerankTopKPrebuilt(corpus: DataFrame, corpusPath: String,
      queries: DataFrame, k: Int,
      numCentroids: Int = 64, nprobe: Int = 8, m: Int = 4, ksub: Int = 16,
      rerank: Int = 100,
      embCol: String = "embedding", idCol: String = "vec_id",
      chunkSize: Int = MaxLiteralQueries): DataFrame = {
    require(rerank >= k, s"rerank $rerank must be >= k $k")
    require(chunkSize > 0, "chunkSize must be positive")
    require(numCentroids <= Similarity.MaxLiteralCentroids,
      s"prebuilt rerank serves the literal regime (numCentroids <= ${Similarity.MaxLiteralCentroids}); use ivfPqRerankTopK")
    val spark = corpus.sparkSession
    import spark.implicits._
    val index = storedIvfPqIndex(corpus, corpusPath, numCentroids, m, ksub,
      embCol, idCol)
    val cp = Similarity.prepared(corpus, embCol, idCol)
      .transform(graft.core.OpCaches.persistTracked)
    val sample = Similarity.storedPreparedSample(corpus, corpusPath,
      math.max(ksub, numCentroids), embCol, idCol)
    val qrowsB = buildCollect(queries)(Similarity.collectVecRows(
      Similarity.prepared(queries, embCol, idCol), idCol))
    val nominate = fromIndexLiteral(index, sample, qrowsB, rerank,
      numCentroids, nprobe, m, ksub, idCol, chunkSize)
    val qp = qrowsB.await().toSeq.map(q => (q.id, q.v.toSeq, q.n2))
      .toDF("query_id", "qv", "qn2")
    rerankTail(cp, nominate.select(col("query_id"), col(idCol)), qp, k, idCol)
  }
}
