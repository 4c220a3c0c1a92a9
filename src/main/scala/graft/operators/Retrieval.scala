package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, TopKFunctions}

/** Full-text retrieval over the document corpus: BM25 scoring of a
  * (small) query set against every document, top-k per query.
  *
  * Okapi BM25 with the Robertson/Sparck-Jones idf in its
  * Lucene-standard non-negative form, idf = ln(1 + (N - df + 0.5) /
  * (df + 0.5)) (Robertson & Zaragoza, "The Probabilistic Relevance
  * Framework: BM25 and Beyond", FnTIR 2009). The reference engine's
  * domain is selective search over sharded retrieval runs
  * (`/root/reference/dataproc/selectivesearch.py`); this operator
  * supplies the scoring side a user of such a pipeline runs upstream.
  *
  * Scale shape (the design target is a corpus far larger than the
  * query set):
  *  - the query term set broadcasts and semi-join-prunes the exploded
  *    token stream BEFORE the tf aggregation, so the only shuffle
  *    over corpus-sized data carries (doc_id, matched-term) rows —
  *    tokens that match no query never leave the map side;
  *  - document frequencies reduce via a map-side-combined
  *    groupBy(term) aggregate (|terms| rows) broadcast back onto the
  *    pruned (doc, term) counts — never a per-term window, whose
  *    single-task partitions would be corpus-sized for a high-df
  *    term; ReuseExchange keeps the corpus tokenize pass at one (both
  *    tf consumers share one exchange), and the document length rides
  *    the tf grouping key so no per-doc-length join exists;
  *  - per-term weights are computed row-local and quantized to an
  *    exact integer (floor(w * 1e9)), so the per-document sum is
  *    order-independent — byte-identical at any parallelism, and
  *    reproducible against a single-threaded oracle;
  *  - the per-query top-k uses the bounded [[TopKFunctions.top_k]]
  *    aggregate: each map task ships at most k (score, doc) pairs per
  *    query, never a corpus-sized sorted run.
  *
  * Corpus statistics (N, avgdl) reduce to one broadcast row; avgdl is
  * computed as exact-integer sum(dl)/N rather than avg(), whose
  * streaming accumulation order engines disagree on.
  */
object Retrieval {

  /** Top-k documents per query by BM25.
    *
    * @param docs    corpus with `idCol` (long) and `textCol` (string)
    * @param queries (queryIdCol, termCol) rows — one row per query term;
    *                terms absent from the corpus contribute nothing
    * @return (query_id, rank, doc_id, score) — rank 1-based by
    *         (score desc, doc_id asc); score = quantized BM25 sum
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", termCol: String = "term"): DataFrame = {
    // corpus stats as ONE self-contained aggregate pass (count + exact
    // integer token-count sum): a broadcast subtree that runs
    // concurrently with the tf pass inside one job — no shared `dl`
    // frame, no cache to race (round-13 JobGapProbe: the former lazy
    // dl/tf persists were raced by their concurrent consumers into
    // four overlapping duplicate tokenize jobs, and eager counts just
    // serialized them; this shape has neither)
    val stats = docs
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long")).as("sum_dl"))
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val q = queries.select(col(queryIdCol).as("query_id"), col(termCol).as("term"))
    // ONE corpus tokenize pass carries the document length with it:
    // dl = size(tokens) rides the explode (equal to tokenCount for
    // every document that can appear here — a blank document's only
    // token is the empty string, which matches no query term) and
    // lands in the grouping key, so the per-doc-length join is gone.
    // df as a tiny groupBy(term) aggregate broadcast back onto tf,
    // NOT a window partitioned by term: the window would route every
    // (doc, term) row of one term to a single task, and a
    // stopword-like high-df query term makes that partition
    // corpus-sized. The aggregate is map-side combined (|terms| rows
    // cross the wire). tf is consumed twice (df aggregate + weighted
    // join) but both consumers sit above the IDENTICAL
    // groupBy(doc_id, dl, term) exchange, which ReuseExchange dedupes
    // — the tokenize pass runs once with no cache at all (the
    // tfidfTopTerms lesson: block-store materialization measured pure
    // overhead next to a reused exchange).
    val tf = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__ws"))
      .select(col("doc_id"), size(col("__ws")).as("dl"),
        explode(col("__ws")).as("term"))
      .join(broadcast(q.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfCounts = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // all floating steps mirror the oracle SQL token-for-token:
    // left-associative, constants pre-folded in Scala and printed via
    // shortest-round-trip toString on both sides
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfn = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl"))))
    val w = tf
      .join(broadcast(dfCounts), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(q), Seq("term"))
      .select(col("query_id"), col("doc_id"),
        floor(idf * tfn * lit(1.0e9)).as("w"))
    // rank on the exact scaled integer (as double: < 2^53, lossless);
    // divide back to the real-valued score only at the output edge
    val scored = w.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w")).as("ws"))
      .select(col("query_id"), col("doc_id"), col("ws").cast("double").as("wsd"))
    scored.groupBy(col("query_id"))
      .agg(TopKFunctions.top_k(col("wsd"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"),
        (col("col.score") / lit(1.0e9)).as("score"))
  }

  /** Top TF-IDF terms per document — the keyword-extraction /
    * salient-term-features step of a corpus pipeline. Plain raw-count
    * tf with the unsmoothed ratio idf, score = tf * N / df as exactly
    * two IEEE operations in that order (multiply, then divide — both
    * correctly rounded, so any engine replaying the same op order is
    * bit-identical; no transcendental in the hot path, unlike BM25's
    * ln which leans on the integer quantization).
    *
    * Scale shape: one corpus tokenize pass (the two tf consumers
    * share one exchange via ReuseExchange — see the in-body note),
    * df via a map-side-combined groupBy(term) aggregate joined back
    * (never a per-term window — a stopword's partition would be
    * corpus-sized), and the
    * per-document top-k via the bounded [[TopKFunctions.top_k_tag]]
    * heap (≤ topK rows per document per map task), never a full
    * sort.
    *
    * @return (doc_id, rank, term, tf, score): rank 1-based by
    *         (score desc, term asc) per document, `topK` rows max.
    */
  def tfidfTopTerms(docs: DataFrame, topK: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastDf: Boolean = false): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    // NOT persisted, deliberately: tf is consumed twice (df aggregate
    // + scoring join), but both consumers sit above the IDENTICAL
    // groupBy(doc, term) exchange, which ReuseExchange dedupes — the
    // tokenize+partial-agg pass runs once either way, and the block-
    // store materialization is pure overhead (interleaved A/B,
    // TfidfProbe: 1.02 s persisted vs 0.82 s reused at sf0.1). The
    // bm25 operator's dl persist is different: its consumers sit on
    // DIFFERENT plans (an agg row and a join side), so no exchange
    // dedups them.
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // tf rows are one per (doc, term), so count(*) per term IS the
    // document frequency. The df frame is VOCABULARY-sized, not
    // corpus-sized. Default is a PLAIN join and letting AQE convert:
    // when the vocabulary's runtime stats fit the broadcast threshold
    // AQE broadcasts it (no corpus re-shuffle) and when it doesn't —
    // a web-scale vocabulary — it correctly stays a shuffle join; an
    // eager broadcast() would OOM the driver exactly there. The
    // interleaved A/B (TfidfProbe, sf0.1) also measured the eager
    // broadcast SLOWER at toy scale (1.62 vs 1.21 s): it serializes
    // the tf materialization into a driver collect before the main
    // job, where the one-DAG shuffle plan overlaps them.
    // `broadcastDf = true` forces the eager broadcast for callers
    // that know their vocabulary and want the hint pinned.
    val dfCounts = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(if (broadcastDf) broadcast(dfCounts) else dfCounts, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf").cast("double") * col("n_docs").cast("double") /
          col("df").cast("double")).as("score"))
    // per-doc top-k via the bounded top_k_tag heap, NOT a window:
    // each map task ships at most topK rows per document and the
    // doc-grain exchange never sorts whole partitions. The tiebreak
    // key is the term STRING, so the long-id top_k cannot carry it;
    // the tag packs term || NUL || tf. NUL (0x00) cannot occur inside
    // a whitespace-split token short of a NUL-bearing document and
    // sorts below every other byte, so (score desc, tag asc) ==
    // (score desc, term asc) — a TAB separator would mis-order terms
    // containing C0 controls below 0x09 — and tf rides along free.
    val packed = scored.groupBy(col("doc_id"))
      .agg(TopKFunctions.top_k_tag(col("score"),
        concat_ws("\u0000", col("term"), col("tf")), topK).as("__top"))
    packed
      .select(col("doc_id"), posexplode(col("__top")))
      .select(col("doc_id"),
        (col("pos") + 1).cast("int").as("rank"),
        element_at(split(col("col.tag"), "\u0000"), 1).as("term"),
        element_at(split(col("col.tag"), "\u0000"), 2).cast("long").as("tf"),
        col("col.score").as("score"))
  }
}
