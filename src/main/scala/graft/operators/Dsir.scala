package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}

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
  *  - both bucket tables are ≤ B rows BY CONSTRUCTION at any corpus
  *    scale (the whole point of hashed features) and reduce via
  *    map-side-combined groupBy(bucket) counts; they broadcast onto
  *    the score pass along with the one-row (n_T, n_R) totals frame —
  *    kept IN-PLAN as broadcast subtrees, not driver collects, so the
  *    model build overlaps the score job's other inputs;
  *  - the score side is ONE tokenize pass over the raw corpus (the
  *    kind-tagged unigram+bigram explode), a broadcast join on
  *    bucket, and a per-document aggregation (map-side partial).
  *    Nothing corpus-sized ever broadcasts or shuffles wide.
  *
  * The raw pool is scored against itself (every feature's bucket has
  * c_R ≥ 1 for its own occurrences), so the left model join can be
  * inner on the raw side after the zero-fill of c_T — buckets the
  * target never hit still score through the +1 smoothing.
  */
object Dsir {

  /** Kind-tagged unigram+bigram feature stream of a token-array
    * column: unigrams as the tokens themselves, bigrams as "a b" —
    * both with multiplicity (DSIR counts occurrences, not types).
    */
  private def featuresOf(ws: Column): Column = concat(
    ws,
    when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array()))

  private def bucketOf(feature: Column, buckets: Int): Column =
    HashFunctions.md5_pair(feature).getItem(0) % buckets

  /** The fitted model as broadcastable frames: a ≤B-row
    * (bucket, c_t) table for the target and a one-row (n_t) totals
    * frame — raw-side counts come from the score pass's own corpus.
    */
  private def targetModel(target: DataFrame, buckets: Int,
      textCol: String): (DataFrame, DataFrame) = {
    val tf = target
      .select(explode(featuresOf(
        TextFunctions.tokensNonEmpty(col(textCol)))).as("f"))
      .select(bucketOf(col("f"), buckets).as("bucket"))
    val counts = tf.groupBy(col("bucket")).agg(count(lit(1)).as("c_t"))
    val total = counts.agg(coalesce(sum(col("c_t")), lit(0L)).as("n_t"))
    (counts, total)
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
    val (tCounts, tTotal) = targetModel(target, buckets, textCol)
    // raw-side bucket counts and totals from the scored corpus itself
    val rFeats = raw
      .select(col(idCol), explode(featuresOf(
        TextFunctions.tokensNonEmpty(col(textCol)))).as("f"))
      .select(col(idCol), bucketOf(col("f"), buckets).as("bucket"))
    val rCounts = rFeats.groupBy(col("bucket")).agg(count(lit(1)).as("c_r"))
    val rTotal = rCounts.agg(coalesce(sum(col("c_r")), lit(0L)).as("n_r"))
    // model join: raw buckets are inner (every scored feature's bucket
    // exists in rCounts by construction); target counts zero-fill
    val q = floor(lit(1e9) * log(
      ((coalesce(col("c_t"), lit(0L)) + lit(1L)).cast("double") /
        (col("n_t") + lit(buckets.toLong)).cast("double")) /
        ((col("c_r") + lit(1L)).cast("double") /
          (col("n_r") + lit(buckets.toLong)).cast("double")))).cast("long")
    rFeats
      .join(broadcast(rCounts), Seq("bucket"))
      .join(broadcast(tCounts), Seq("bucket"), "left")
      .crossJoin(broadcast(tTotal))
      .crossJoin(broadcast(rTotal))
      .select(col(idCol), q.as("q"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("q")).as("qsum"))
      .select(col(idCol), col("n_feats"),
        (col("qsum").cast("double") / lit(1e9)).as("logweight"))
  }

  // The "resample the most target-like slice" step is a composition,
  // not a new operator: importanceWeights(...) piped through
  // [[Curation.topFraction]] (or the skew-safe topFractionBounded)
  // on logweight — the registered dsir_select row does exactly that.
}
