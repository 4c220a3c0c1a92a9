package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003): hash every k-token shingle, then keep the minimum
  * hash of each sliding window of `w` consecutive shingle hashes.
  * The selected set is position-independent (dedup'd), guarantees a
  * shared fingerprint for any copied passage of ≥ w + k - 1 tokens,
  * and is ~2/(w+1) of the shingle count — the MOSS-style sketch a
  * plagiarism / near-dup passage detector builds at corpus scale.
  *
  * Engine-portable by construction: shingle hashes are the first 48
  * bits of md5 (hex-sliced — the same scheme the simhash and sampler
  * oracles replay in DuckDB), windows and mins are plain list ops,
  * and the output is the DISTINCT fingerprint set so no positional
  * tiebreak is needed.
  *
  * Scale shape: map-only per-document compute (no shuffle, no state);
  * the three HOF stages are separate projections so the token split
  * and hash array each evaluate once per row (CollapseProject keeps
  * multi-referenced non-cheap aliases materialized). Documents with
  * fewer than k tokens produce no shingles and are dropped; documents
  * with fewer than w shingles winnow over one full-width window (the
  * paper's short-document degeneration), so every shingled document
  * keeps ≥ 1 fingerprint.
  */
object Fingerprint {

  /** First 48 bits of md5(s) as a non-negative long (oracle form:
    * `('0x' || substr(md5(s), 1, 12))::BIGINT`).
    */
  private def md5Hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** (idCol, fp) rows — the distinct winnowing fingerprint set per
    * document, fp ascending within a document. One native byte walk
    * per row ([[graft.functions.WinnowKernels]]): the declarative HOF
    * form below evaluated an interpreted md5+conv lambda per shingle
    * (1.25 s at sf0.1, 3.2× the oracle; kernel ~0.3 s) —
    * [[winnowFingerprintsDeclarative]] stays as the property-pinned
    * semantic reference.
    *
    * explode_OUTER + null filter, deliberately: a plain explode
    * triggers InferFiltersFromGenerate, whose pushed-down predicate
    * re-evaluates the generator child under the scan (catastrophic
    * for the old HOF chain — 37 s vs 0.4 s at sf0.01, plan md5-count
    * 9 vs 1, WinnowProbe — and still a doubled kernel call now).
    * Short docs yield an empty array ⇒ one null row ⇒ the cheap
    * attribute filter above the Generate.
    */
  def winnowFingerprints(docs: DataFrame, k: Int, w: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, s"shingle size k must be positive, got $k")
    require(w > 0, s"winnow window w must be positive, got $w")
    docs
      .select(col(idCol),
        graft.functions.WinnowFunctions.winnow_fps(col(textCol), k, w)
          .as("__fps"))
      .select(col(idCol), explode_outer(col("__fps")).as("fp"))
      .filter(col("fp").isNotNull)
  }

  /** The declarative HOF formulation — the semantic reference the
    * native kernel is pinned against (OperatorsSuite property test);
    * not registered, and slow by construction (interpreted md5 lambda
    * per shingle).
    */
  private[graft] def winnowFingerprintsDeclarative(docs: DataFrame, k: Int,
      w: Int, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    docs
      .select(col(idCol),
        graft.functions.TextFunctions.tokensNonEmpty(col(textCol))
          .as("__toks"))
      .filter(size(col("__toks")) >= k)
      // positional k-shingle hash sequence (NOT the distinct
      // word_shingles kernel — winnowing needs every position)
      .select(col(idCol),
        transform(sequence(lit(1), size(col("__toks")) - (k - 1)),
          i => md5Hash48(concat_ws(" ", slice(col("__toks"), i, lit(k)))))
          .as("__h"))
      // per-window minima over width min(w, m), ≥ 1 window always
      .select(col(idCol), col("__h"),
        least(lit(w), size(col("__h"))).as("__ws"))
      .select(col(idCol),
        array_sort(array_distinct(
          transform(sequence(lit(1), size(col("__h")) - col("__ws") + 1),
            j => array_min(slice(col("__h"), j, col("__ws"))))))
          .as("__fps"))
      // explode_OUTER, deliberately: InferFiltersFromGenerate infers
      // `size(child) > 0 AND isnotnull(child)` for a plain explode,
      // and predicate pushdown then substitutes the WHOLE aliased HOF
      // chain into a Filter under the scan — the md5 transform appears
      // 6+ times in that (interpreted, no-subexpression-elimination)
      // predicate and re-runs per input row: measured 37 s vs 0.4 s at
      // sf0.01 (WinnowProbe/WinnowExplain; optimized-plan md5-count 9
      // vs 1). Outer generators get no inferred filter, and `__fps` is
      // provably non-empty here (every doc that survives the >= k
      // filter has >= 1 window), so outer ≡ inner row-for-row.
      .select(col(idCol), explode_outer(col("__fps")).as("fp"))
  }

  /** Candidate near-duplicate pairs sharing at least `minShared`
    * winnowing fingerprints — the MOSS-style passage-overlap
    * detector built on [[winnowFingerprints]]. Same posting-list
    * shape as [[Dedup.ngramJaccardPairsPostings]]: one row per
    * distinct fingerprint with its sorted doc list (df-capped — a
    * boilerplate passage shared by everything is uninformative and
    * its pair expansion quadratic), pairs expanded per posting,
    * shared counts aggregated. No all-pairs join anywhere.
    *
    * @return (id_a, id_b, n_shared) with id_a < id_b
    */
  def winnowPairs(docs: DataFrame, k: Int, w: Int, minShared: Int,
      maxDocFreq: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minShared > 0, s"minShared must be positive, got $minShared")
    val fps = winnowFingerprints(docs, k, w, idCol, textCol)
    val posts = fps.groupBy(col("fp"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) <= maxDocFreq)
      .select(col("ids"))
    val pairCombos = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))),
        y => struct(x.as("id_a"), y.as("id_b")))))
    posts.select(explode(pairCombos).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
