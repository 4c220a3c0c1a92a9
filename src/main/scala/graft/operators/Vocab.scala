package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Frequency-vocabulary construction and corpus token-id encoding —
  * the word-level "tokenizer fit + transform" pair of a training-data
  * pipeline: learn the top-V terms once, then map every document to
  * its integer-id sequence (OOV → 0).
  *
  * Determinism: vocabulary rank is the total (freq desc, term asc)
  * order, so ids are identical in any engine at any parallelism;
  * encoding is then a pure broadcast lookup.
  *
  * Scale shape: the vocabulary build is one token-count aggregate
  * (map-side combined) finished by the bounded
  * [[graft.functions.TopKAggregate]] — each map task ships at most V
  * (freq, term) pairs, never the term universe — and the encode pass
  * is a stateless posexplode + broadcast join: no corpus-sized
  * shuffle anywhere (the output sort is the presentation contract).
  * The encode join carries an explicit broadcast() hint — safe
  * because V is builder-bounded (the vocabulary is at most
  * `vocabSize` rows by construction); a deployment wanting
  * million-term vocabularies should drop the hint and let Spark's
  * size estimation pick the join side.
  */
object Vocab {

  /** The vocabulary-identity contract, in ONE place: top `vocabSize`
    * terms of a bare `term` frame by (freq desc, term asc), ids 1..V
    * — shared by [[buildVocab]] and the fused [[vocabEncode]], so
    * the rank-to-id convention cannot drift between the stored-fit
    * streaming path and the registered batch query.
    */
  private def vocabFromTerms(terms: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize $vocabSize must be positive")
    terms
      .groupBy(col("term"))
      .agg(count(lit(1)).as("freq"))
      .agg(graft.functions.TopKFunctions
        .top_k_tag(col("freq").cast("double"), col("term"), vocabSize).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("int").as("token_id"),
        col("col.tag").as("term"),
        col("col.score").cast("long").as("freq"))
  }

  /** The top `vocabSize` terms by (freq desc, term asc):
    * (token_id 1..V, term, freq). Id 0 is reserved for OOV.
    */
  def buildVocab(docs: DataFrame, vocabSize: Int,
      textCol: String = "text"): DataFrame =
    vocabFromTerms(
      docs.select(explode(TextFunctions.tokensNonEmpty(col(textCol))).as("term")),
      vocabSize)

  /** Every document as its token-id sequence, one row per position:
    * (idCol, pos, token_id), OOV terms encoded as 0.
    */
  def encodeTokens(docs: DataFrame, vocab: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), posexplode(TextFunctions.tokensNonEmpty(col(textCol))))
      .withColumnRenamed("col", "term")
      .join(broadcast(vocab.select(col("term"), col("token_id"))),
        Seq("term"), "left")
      .select(col(idCol), col("pos").cast("int").as("pos"),
        coalesce(col("token_id"), lit(0)).as("token_id"))

  /** Fit + transform in one call (the registered-query shape).
    *
    * Tokenizes the corpus EXACTLY ONCE: the exploded
    * (id, pos, term) frame is persisted (tracked — the ngram/tfidf
    * discipline) and feeds the vocabulary count, the encode probe,
    * AND the final sort's range-sampling pass, where the naive
    * composition of [[buildVocab]] + [[encodeTokens]] would run the
    * tokenize three times per call (fit side, encode side, sampling
    * re-execution). The separate builder/encoder stay as-is for
    * callers with a prebuilt vocabulary (streams cannot persist).
    */
  def vocabEncode(docs: DataFrame, vocabSize: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(vocabSize > 0, s"vocabSize $vocabSize must be positive")
    val toks = docs
      .select(col(idCol), posexplode(TextFunctions.tokensNonEmpty(col(textCol))))
      .withColumnRenamed("col", "term")
      // EAGER: the vocabulary broadcast build and the final sort's
      // sampling job both consume toks and start concurrently — a
      // lazy persist let them race the cold cache and tokenize the
      // corpus twice (JobGapProbe round 13: two overlapping ~0.24 s
      // jobs at sf0.1)
      .transform(graft.core.OpCaches.persistTrackedEager)
    val vocab = vocabFromTerms(toks.select(col("term")), vocabSize)
      .select(col("term"), col("token_id"))
    toks
      .join(broadcast(vocab), Seq("term"), "left")
      .select(col(idCol), col("pos").cast("int").as("pos"),
        coalesce(col("token_id"), lit(0)).as("token_id"))
      .orderBy(col(idCol).asc, col("pos").asc)
  }

  /** [[buildVocab]] behind the metadata-versioned
    * [[graft.core.IndexStore]] — the tokenizer is a FIT ARTIFACT like
    * an ANN index: fit once against the corpus fingerprint, then
    * every encode call (batch or streaming) reads the V-row store
    * entry and never re-scans the source. Rebuilt only when the
    * source parquet fingerprint or `vocabSize` changes.
    */
  def storedVocab(docs: DataFrame, docsPath: String, vocabSize: Int,
      textCol: String = "text", force: Boolean = false): DataFrame = {
    val name = s"vocab-v$vocabSize-$textCol-v1-" +
      graft.core.IndexStore.md5hex(docsPath)
    graft.core.IndexStore.readOrBuild(docs.sparkSession, name,
      graft.core.IndexStore.sourceFingerprint(docsPath), force)(
      buildVocab(docs, vocabSize, textCol))
  }
}
