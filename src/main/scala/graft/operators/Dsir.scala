package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** DSIR-style hashed n-gram importance weights — the data-selection
  * step of Xie et al., "Data Selection for Language Models via
  * Importance Resampling" (NeurIPS 2023): score every raw document by
  * how much more likely its hashed n-gram features are under a target
  * distribution (the domain you want more of) than under the raw
  * pool, then keep/resample by that weight.
  *
  * Features are unigrams AND bigrams with multiplicity, hashed into B
  * buckets (bucket = first-48-bits-of-MD5 mod B — the
  * [[HashFunctions.md5_pair]] native's h1, SQL-replayable, always
  * non-negative so `%` needs no pmod guard). Both distributions are
  * Laplace-smoothed bucket frequencies:
  *
  *   p_T[b] = (c_T[b] + 1) / (n_T + B),  p_R[b] likewise,
  *
  * and a document's log importance weight is the sum of
  * ln(p_T[b]/p_R[b]) over its feature occurrences. Each log term
  * quantizes to floor(1e9 · ln ·) — the BM25/LM house rule — so the
  * per-document sum is exact-integer, reduction-order-free, and
  * hash-matches a relational oracle; the one double division happens
  * at the output edge.
  *
  * Scale shape (the CCNet/LM model-then-score discipline):
  *  - raw and target bucket counts collapse into a single
  *    map-side-combined groupBy(bucket) over one feature pass (its
  *    output is ≤B rows BY CONSTRUCTION at any corpus scale — the
  *    whole point of hashed features), small enough to collect: the
  *    per-bucket quantized log term rides back into the plan as ONE
  *    B-slot array literal (the pinned-codebook pattern), so the
  *    operators are EAGER — construction runs the bounded model job;
  *  - the score side is then join-free: a second feature pass probes
  *    the literal array O(1) per occurrence and reduces per document
  *    (map-side partial). Nothing corpus-sized ever broadcasts,
  *    collects, or shuffles wide.
  *
  * The raw pool is scored against itself (every feature's bucket has
  * c_R ≥ 1 for its own occurrences), so the model join is inner on
  * the raw side — buckets the target never hit still score through
  * the +1 smoothing (c_T = 0 rows carry their quantized term).
  */
object Dsir {

  private def bucketOf(feature: Column, buckets: Int): Column =
    HashFunctions.md5_pair(feature).getItem(0) % buckets

  /** Feature stream of one frame: (id, bucket) with the given
    * raw/target membership weights attached. The unigram+bigram
    * emission is the native byte-walk
    * [[graft.functions.TokenizeExpressions]] `ws_ngram_features`
    * kernel — the declarative `concat(tokens, transform(sequence,
    * element_at‖concat_ws))` form re-evaluates its inlined tokenize
    * subtree inside the higher-order lambda (the CollapseProject
    * trap the Shingle kernel documents) and measured ~1.7 s
    * single-task at sf0.1 (DsirProbe); the kernel is one walk. The
    * [[graft.core.Parallelism.kernelFloor]] guard spreads that walk
    * across cores when the source is a too-small-to-split scan —
    * a no-op at cluster scale.
    */
  private def featStream(df: DataFrame, buckets: Int, textCol: String,
      id: Column, wR: Column, wT: Column,
      extraCols: Seq[String] = Nil): DataFrame =
    graft.core.Parallelism.kernelFloor(df)
      .select(id.as("__id") +: explode(
        graft.functions.TokenizeFunctions.ws_ngram_features(
          col(textCol), 2)).as("f") +: wR.as("w_r") +: wT.as("w_t") +:
        extraCols.map(col): _*)
      .select(col("__id") +: bucketOf(col("f"), buckets).as("bucket") +:
        col("w_r") +: col("w_t") +: extraCols.map(col): _*)

  /** Shared core: one feature-stream SHAPE `(id, bucket, w_r, w_t)`
    * serves the raw model (c_r = Σ w_r), the target model
    * (c_t = Σ w_t), and the score pass (rows with w_r = 1) — and the
    * stream is RECOMPUTED per consumer, not cached: with the
    * byte-walk kernel the whole emit+hash pipeline costs ~0.12 s at
    * sf0.1 while persisting it costs ~0.36 s before the first warm
    * read (DsirProbe r14) — below roughly a 3:1 reuse:recompute cost
    * ratio a cache is a net loss, and at 100 TB persisting a
    * corpus-sized explode is exactly what does not fit. Both bucket
    * tables collapse into a single map-side-combined groupBy(bucket)
    * (≤B rows BY CONSTRUCTION at any corpus scale — the hashed-
    * feature contract), which is small enough to ride to the DRIVER
    * as one bounded collect: the per-bucket quantized log term q
    * returns to the plan as a single B-slot array LITERAL indexed
    * O(1) by bucket — the pinned-codebook pattern. That removes the
    * totals-broadcast and model-broadcast materialization jobs the
    * previous in-plan form paid (each a full driver round at toy
    * scale) and makes the score side join-free: one kernel pass,
    * one array probe per feature, one per-document partial agg.
    * The collect is NOT a driver-side loop over data — it is the
    * model itself, ≤B rows at any corpus size, exactly like
    * collecting a k-means codebook. Nothing corpus-sized ever
    * persists, broadcasts, collects, or shuffles wide.
    */
  private def weightsFrom(feats: DataFrame, buckets: Int,
      idCol: String, extraCols: Seq[String] = Nil): DataFrame = {
    // one bounded job: kernel pass + map-side-combined (bucket)
    // exchange, ≤buckets output rows
    val counts = feats.groupBy(col("bucket"))
      .agg(sum(col("w_r")).as("c_r"), sum(col("w_t")).as("c_t"))
      .collect()
    var nR = 0L; var nT = 0L
    counts.foreach { r => nR += r.getLong(1); nT += r.getLong(2) }
    // exact mirror of the previous in-plan expression (same IEEE
    // double ops in the same order, java.lang.Math.log both sides):
    // q[b] = floor(1e9 · ln(((c_t+1)/(n_t+B)) / ((c_r+1)/(n_r+B))));
    // buckets with no features keep the all-zero smoothing term —
    // a scoring row's bucket always has c_r ≥ 1, so those slots are
    // never probed
    val qDefault = math.floor(1e9 * math.log(
      (1.0 / (nT + buckets).toDouble) / (1.0 / (nR + buckets).toDouble))).toLong
    val qArr = Array.fill(buckets)(qDefault)
    counts.foreach { r =>
      val num = (r.getLong(2) + 1L).toDouble / (nT + buckets).toDouble
      val den = (r.getLong(1) + 1L).toDouble / (nR + buckets).toDouble
      qArr(r.getLong(0).toInt) = math.floor(1e9 * math.log(num / den)).toLong
    }
    // w_r is lit(1) in the self-target form — constant folding
    // removes the filter there; the two-frame form keeps it to drop
    // target-only rows from scoring
    // extraCols ride the per-doc aggregation as grouping keys: each
    // is functionally dependent on the id, so the group count is
    // unchanged — this is how a caller gets e.g. the stratum column
    // into the output without a second join against the corpus
    feats.filter(col("w_r") === 1)
      .select(col("__id") +:
        element_at(typedLit(qArr.toSeq),
          (col("bucket") + lit(1L)).cast("int")).as("q") +:
        extraCols.map(col): _*)
      .groupBy(col("__id") +: extraCols.map(col): _*)
      .agg(count(lit(1)).as("n_feats"), sum(col("q")).as("qsum"))
      .select(col("__id").as(idCol) +: col("n_feats") +:
        (col("qsum").cast("double") / lit(1e9)).as("logweight") +:
        extraCols.map(col): _*)
  }

  /** Per-document log importance weight of every raw document with at
    * least one token: (idCol, n_feats, logweight) where logweight =
    * qsum / 1e9, qsum = Σ floor(1e9·ln(p_T[b]/p_R[b])) over the
    * document's feature occurrences. Positive = more target-like.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      buckets: Int = 8192, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(buckets > 0, s"buckets $buckets must be positive")
    // target features enter the model stream with a null id and
    // w_r = 0: they shape c_t/n_t but never score
    val rf = featStream(raw, buckets, textCol, col(idCol), lit(1), lit(0))
    val tf = featStream(target, buckets, textCol,
      lit(null).cast(raw.schema(idCol).dataType), lit(0), lit(1))
    weightsFrom(rf.union(tf), buckets, idCol)
  }

  /** Self-target form — target = raw rows matching `targetPred` (the
    * common deployment: "more like the en/books/wiki slice of this
    * very pool"). One feature pass carries both memberships: w_r = 1
    * everywhere, w_t = 1 where the predicate holds. Output is
    * row-identical to `importanceWeights(raw, raw.filter(targetPred))`
    * at half the tokenize work — pinned by DsirSubstringSuite.
    */
  def importanceWeightsSelf(raw: DataFrame, targetPred: Column,
      buckets: Int = 8192, textCol: String = "text",
      idCol: String = "doc_id", extraCols: Seq[String] = Nil): DataFrame = {
    require(buckets > 0, s"buckets $buckets must be positive")
    weightsFrom(featStream(raw, buckets, textCol, col(idCol),
      lit(1), when(targetPred, 1).otherwise(0), extraCols),
      buckets, idCol, extraCols)
  }

  // The "resample the most target-like slice" step is a composition,
  // not a new operator: importanceWeights(...) piped through
  // [[Curation.topFraction]] (or the skew-safe topFractionBounded)
  // on logweight — the registered dsir_select row does exactly that.
}
