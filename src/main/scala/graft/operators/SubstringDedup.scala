package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}

/** Exact duplicated-substring spans — the token-window form of the
  * suffix-array substring dedup of Lee et al., "Deduplicating
  * Training Data Makes Language Models Better" (ACL 2022): find every
  * maximal run of tokens covered by a w-token window that occurs at
  * least twice in the corpus (across documents or repeated within
  * one). Where MinHash/SimHash/winnowing flag whole near-duplicate
  * DOCUMENTS, this flags the duplicated REGIONS themselves — the
  * boilerplate headers, licence blocks, and templated paragraphs a
  * pretraining pipeline excises from otherwise-unique pages.
  *
  * Relational shape (suffix arrays are pointer-machine; this is the
  * same predicate — "this w-token substring appears ≥2 times" — as
  * joins and windows):
  *
  *  1. one tokenize pass emits every w-token window as a 96-bit MD5
  *     key (two exact 48-bit halves — the [[HashFunctions.md5_pair]]
  *     native, SQL-replayable as substr(md5(s), 1|13, 12));
  *  2. duplicated keys reduce via a map-side-combined
  *     groupBy(h1, h2) count — |distinct windows| rows cross the
  *     wire, never the corpus text;
  *  3. a left-semi join marks each document's duplicated windows
  *     (output ≤ the window stream; no pair expansion, so a window
  *     repeated a million times costs its count, not its square);
  *  4. overlapping-or-adjacent duplicated windows merge into maximal
  *     spans with the classic running-max interval merge — a per-doc
  *     analytic window over only the DUPLICATED windows (bounded by
  *     dup density, not document length).
  *
  * Scale: the only corpus-sized shuffle is step 2/3's (h1, h2) key
  * exchange, O(total tokens) rows of ~28 bytes — the standard dedup
  * wire budget; everything after is proportional to the duplicated
  * subset. No all-pairs, no per-term windows, no driver state.
  *
  * Span positions are 1-based token indices, inclusive; a token
  * position is "duplicated" when ≥1 duplicated window covers it, and
  * output spans are the maximal covered runs. Two windows whose
  * spans merely touch ([s, s+w-1], [s+w, ...]) merge — coverage runs,
  * not substring extents.
  */
object SubstringDedup {

  /** Every w-token window of `docs` as its 96-bit MD5 key:
    * (idCol, s, h1, h2) with 1-based token start `s`. The window
    * strings come from the native `ws_ngrams` byte walk (one pass per
    * doc; a doc shorter than w tokens yields no windows), and only
    * the key and position leave the map side.
    */
  private[graft] def windowKeys(docs: DataFrame, windowTokens: Int,
      idCol: String, textCol: String, floor: Boolean = true): DataFrame =
    (if (floor) graft.core.Parallelism.kernelFloor(docs) else docs)
      .select(col(idCol), posexplode(
        graft.functions.TokenizeFunctions.ws_ngrams(col(textCol), windowTokens)))
      .select(col(idCol), (col("pos") + 1).cast("long").as("s"),
        HashFunctions.md5_pair(col("col")).as("hp"))
      .select(col(idCol), col("s"),
        col("hp").getItem(0).as("h1"), col("hp").getItem(1).as("h2"))

  /** A window is duplicated when its key occurs >= 2 times anywhere —
    * another document OR a repeat within the same one. Output is
    * |distinct duplicated windows| rows of (h1, h2).
    */
  private def dupKeysOf(wins: DataFrame): DataFrame =
    wins.groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("h1"), col("h2"))

  /** The corpus's duplicated-window key table: (h1, h2) for every
    * w-token window occurring >= 2 times in `docs` — the "known
    * boilerplate" vocabulary an ingest-time screen probes
    * ([[graft.streaming.DocsStream.substringDupScreen]] is the
    * streaming consumer; at scale this is the stored side, exactly
    * like the minhash band index).
    */
  def duplicatedWindowKeys(docs: DataFrame, windowTokens: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(windowTokens >= 2,
      s"windowTokens $windowTokens must be >= 2 (a 1-token window is word_freq)")
    dupKeysOf(windowKeys(docs, windowTokens, idCol, textCol))
  }

  /** [[duplicatedWindowKeys]] served from the
    * [[graft.core.IndexStore]]: the corpus dup-key pass (the ONLY
    * corpus-sized work of an ingest screen) runs once per
    * (corpusPath, windowTokens, variant) fingerprint and later calls
    * read index bytes. `variant` is REQUIRED non-empty and must name
    * the corpus frame — in particular any slicing of the file (the
    * store fingerprints the FILE — two different slices over one
    * path would silently share an entry otherwise, the round-12
    * store-collision lesson; same contract as
    * [[Dsir.storedModelSelf]]).
    */
  def storedDupKeys(corpus: DataFrame, corpusPath: String,
      windowTokens: Int = 20, idCol: String = "doc_id",
      textCol: String = "text", variant: String = "",
      force: Boolean = false): DataFrame = {
    require(variant.nonEmpty,
      "variant must name the corpus frame (store entries fingerprint the file only)")
    val name = s"dupkeys-w$windowTokens-$idCol-$textCol" +
      (if (variant.isEmpty) "" else s"-$variant") + "-v1-" +
      graft.core.IndexStore.md5hex(corpusPath)
    graft.core.IndexStore.readOrBuild(corpus.sparkSession, name,
      graft.core.IndexStore.sourceFingerprint(corpusPath), force)(
      duplicatedWindowKeys(corpus, windowTokens, idCol, textCol))
  }

  /** Batch ingest screen against the stored corpus dup-key table:
    * every w-token window of a `batch` document whose key is already
    * duplicated in the corpus — (idCol, s, e), 1-based inclusive
    * token positions, the batch twin of
    * [[graft.streaming.DocsStream.substringDupScreen]] and the
    * serving form of the marking stage of [[duplicateSpans]].
    *
    * Per-call work is batch-bounded: one `ws_ngrams` walk over the
    * batch, a semi join against index bytes (|distinct corpus
    * duplicated windows| rows — the stored side), nothing
    * corpus-sized recomputed. Window-grain marks, like the streaming
    * twin; span merge and coverage ratios compose via
    * [[duplicationStats]]-style rollups downstream.
    */
  def dupScreenBatchPrebuilt(corpus: DataFrame, corpusPath: String,
      batch: DataFrame, windowTokens: Int = 20, idCol: String = "doc_id",
      textCol: String = "text", variant: String = "",
      force: Boolean = false): DataFrame = {
    val keys = storedDupKeys(corpus, corpusPath, windowTokens, idCol,
      textCol, variant, force)
    // batch side: a LIGHT kernel (the batch is ingest-sized by
    // definition) — no kernelFloor, per the RebalanceProbe regime
    // note in [[graft.core.Parallelism]]; the store side is a small
    // parquet relation with file-size stats, so the semi join plans
    // as a static broadcast — zero exchanges on the serving path
    windowKeys(batch, windowTokens, idCol, textCol, floor = false)
      .join(keys, Seq("h1", "h2"), "left_semi")
      .select(col(idCol), col("s"),
        (col("s") + lit(windowTokens.toLong) - 1L).as("e"))
  }

  /** Maximal duplicated-token spans per document:
    * (idCol, span_start, span_end, span_tokens), ordered output left
    * to the caller. Documents shorter than `windowTokens` have no
    * windows and cannot appear.
    */
  def duplicateSpans(docs: DataFrame, windowTokens: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    duplicateSpansShape(docs, windowTokens, idCol, textCol,
      persistWins = false)

  /** [[duplicateSpans]] with the wins-persist choice exposed for the
    * SortShapeProbe A/B (recompute = the window stream re-derives per
    * consumer, the DSIR inversion candidate). Output-identical either
    * way. Recompute is the default since the r14b interleave
    * (spans 1.58 vs 1.82 s, stats 1.45 vs 1.50 s medians): with the
    * byte-walk kernel at ~0.1 s the eager persist's materialize job
    * costs more than the second kernel pass, which runs CONCURRENTLY
    * with the first inside AQE's exchange materialization — and at
    * 100 TB a corpus-sized window stream cannot persist anyway, so
    * recompute is also the only shape that scales.
    */
  /** The duplicated-window interval stream: (idCol, s, e) for every
    * w-token window whose key occurs >= 2 times — steps 1–3 of the
    * pipeline, shared by the span and stats shapes. The window stream
    * feeds BOTH the dup-key count and the semi-join probe side, and
    * RECOMPUTES per consumer by default: the two consumer exchanges
    * materialize concurrently under AQE, so the second kernel pass
    * overlaps the first, while the eager persist paid a synchronous
    * up-front count job — the same reuse-vs-recompute inversion the
    * DSIR feature stream hit (r14b interleave in
    * [[duplicateSpans]]'s scaladoc).
    */
  private def dupWindows(docs: DataFrame, w: Int, idCol: String,
      textCol: String, persistWins: Boolean): DataFrame = {
    require(w >= 2,
      s"windowTokens $w must be >= 2 (a 1-token window is word_freq)")
    val winsPlan = windowKeys(docs, w, idCol, textCol)
    val wins =
      if (persistWins) graft.core.OpCaches.persistTrackedEager(winsPlan)
      else winsPlan
    // r22 (guide §1.2/§2.4): "occurs >= 2 times" is a per-key COUNT
    // over one exchange of the window stream, not a count-aggregate
    // joined back to a second copy of the stream — the former
    // count-then-semi-join shape tokenized and hashed the whole corpus
    // TWICE (the probe side and the dup-key side each re-derived
    // windowKeys; plans/r22/dup_spans_before.txt ops 3 and 9) and
    // exchanged both the full stream and the key table. One stream,
    // one (h1, h2) exchange, one unbounded count frame — identical
    // predicate, so outputs are row-identical (DsirSubstringSuite +
    // oracle). Skew note: a window key repeated k times buffers k rows
    // in one WindowExec group, exactly what the SMJ/broadcast probe
    // partition held before; the buffer spills.
    val byKey = Window.partitionBy(col("h1"), col("h2"))
    wins.select(col(idCol), col("s"), col("h1"), col("h2"))
      .withColumn("__kc", count(lit(1)).over(byKey))
      .filter(col("__kc") >= 2)
      .select(col(idCol), col("s"), (col("s") + lit(w.toLong) - 1L).as("e"))
  }

  private[graft] def duplicateSpansShape(docs: DataFrame, windowTokens: Int,
      idCol: String, textCol: String, persistWins: Boolean): DataFrame = {
    val w = windowTokens
    val dw = dupWindows(docs, w, idCol, textCol, persistWins)
    // interval merge: a window starts a new span iff it begins past
    // the running max end of all earlier windows + 1 (strictly after
    // any covered-or-adjacent position)
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("s"))
    val prevMax = max(col("e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val marked = dw.select(col(idCol), col("s"), col("e"),
      when(prevMax.isNull || col("s") > prevMax + 1, 1L).otherwise(0L).as("ns"))
    val grouped = marked.select(col(idCol), col("s"), col("e"),
      sum(col("ns")).over(byDoc).as("gid"))
    grouped.groupBy(col(idCol), col("gid"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_tokens"))
  }

  /** Per-document duplication summary — the coverage of
    * [[duplicateSpans]] without materializing the spans:
    * (idCol, n_tokens, dup_tokens, dup_ratio) for every document
    * long enough to have a window, the "drop documents that are
    * mostly boilerplate" filter input. dup_ratio is the one double,
    * computed at the output edge from two exact integers.
    *
    * dup_tokens is the per-doc UNION coverage of the duplicated
    * windows, summed in ONE pass over the interval stream: sorted by
    * start, each window contributes the tokens not already covered
    * by an earlier window — max(0, e − max(s−1, prevMaxEnd)) under
    * the same running-max analytic the span merge uses — which
    * equals the sum of merged span lengths (interval union is
    * invariant to whether adjacent spans merge). Adopted r20 after
    * the DupSpansFloorProbe interleave (spans→groupBy form 1.16 s,
    * coverage form 1.05 s at sf0.1, output-equivalent verified):
    * one analytic window and one aggregation fewer than composing
    * over [[duplicateSpans]], with the identical single shuffle.
    */
  def duplicationStats(docs: DataFrame, windowTokens: Int = 20,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    duplicationStatsShape(docs, windowTokens, idCol, textCol,
      persistWins = false)

  private[graft] def duplicationStatsShape(docs: DataFrame, windowTokens: Int,
      idCol: String, textCol: String, persistWins: Boolean): DataFrame = {
    val dw = dupWindows(docs, windowTokens, idCol, textCol, persistWins)
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("s"))
    val prevMax = max(col("e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = dw.select(col(idCol),
        greatest(col("e") - greatest(col("s") - 1L,
          coalesce(prevMax, lit(0L))), lit(0L)).as("__nc"))
      .groupBy(col(idCol))
      .agg(sum(col("__nc")).as("dup_tokens"))
    docs
      .select(col(idCol),
        graft.functions.TokenizeFunctions.ws_token_count(col(textCol))
          .cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= windowTokens)
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .select(col(idCol), col("n_tokens"), col("dup_tokens"),
        (col("dup_tokens").cast("double") / col("n_tokens")).as("dup_ratio"))
  }
}
