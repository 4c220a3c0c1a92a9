package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: token
  * counting, BPE-ish token estimation, language ID, quality scoring,
  * fingerprinting, word shingles. All pure `Column` expressions
  * (whole-stage-codegen'd, no UDFs), deterministic across engines —
  * each has a matching ANSI-SQL formulation used by the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text — the native byte-walk twin of
    * `split(btrim(c), "\\s+")` (bit-identical semantics pinned by a
    * randomized property; see [[TokenizeKernels]] for why the regex
    * form is a per-row recompile).
    */
  def tokens(c: Column): Column = TokenizeFunctions.ws_tokens(c)

  /** [[tokens]] with empty tokens removed — the full-whitespace-trim
    * tokenization ([[tokens]] alone leaves a leading/trailing EMPTY
    * token when btrim's space-only trim leaves a tab/newline at an
    * edge; the empties only ever occur at the edges, so filtering
    * them == trimming all whitespace). Oracle form:
    * `list_filter(regexp_split_to_array(trim(text), ...), x -> x <> '')`
    * — the repetition-stats convention.
    */
  def tokensNonEmpty(c: Column): Column = TokenizeFunctions.ws_tokens_nonempty(c)

  /** Whitespace token count; 0 for blank text (split of "" yields
    * [""]); native — no token array materializes.
    */
  def tokenCount(c: Column): Column = TokenizeFunctions.ws_token_count(c)

  /** BPE-ish subword-token estimate: alpha runs, digit runs, and
    * single non-alphanumeric marks each count as one token.
    */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** Non-alphanumeric (punctuation) character count. */
  def punctCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[^A-Za-z0-9 ]", ""))

  /** Per-language stopword lists (shared with the oracle SQL, which is
    * generated from these constants).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "a", "is", "to", "in"),
    "es" -> Seq("el", "la", "de", "los", "es", "y", "en"),
    "fr" -> Seq("le", "la", "de", "les", "est", "et", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"))

  /** Per-language stopword hit count over whitespace tokens
    * (declarative; each call embeds its own tokenize — fine standalone,
    * the multi-language compositions use [[TextProfileKernel]]).
    */
  def stopwordHits(c: Column, lang: String): Column = {
    val words = stopwords.toMap.apply(lang)
    size(filter(tokens(c), t => t.isin(words.map(lit(_)): _*)))
  }

  /** Single-pass text profile: [n_tokens, en, es, fr, de, n_punct,
    * n_chars] in one native byte walk (see [[TextProfileKernel]]).
    */
  def textProfile(c: Column): Column = TextProfileFunctions.text_profile(c)

  /** N-gram-heuristic language ID: argmax of per-language stopword
    * hits (ties broken in fixed en > es > fr > de order); "und"
    * (undetermined) when no list scores a hit. Native one-byte-walk
    * kernel: the declarative form embedded one CodegenFallback
    * tokenize per stopword list — 24 `split(` subtrees in the physical
    * plan — because HOF filters block codegen subexpression
    * elimination. [[langIdDeclarative]] is the semantic reference it
    * is property-pinned against (null input: kernel yields null, the
    * declarative CASE yields "und" — registered inputs are non-null).
    */
  def langId(c: Column): Column = TextProfileFunctions.lang_id(c)

  /** The declarative language-ID formulation (slow: one tokenize per
    * stopword list) — retained as the semantic reference for the
    * kernel's ScalaCheck equivalence property.
    */
  def langIdDeclarative(c: Column): Column = {
    val scores = stopwords.map { case (lang, _) => lang -> stopwordHits(c, lang) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Heuristic document quality score in ~[-1, 2]: rewards stopword
    * density and length, penalizes punctuation density. All terms are
    * ratios of exact integer counts — bit-identical in any engine.
    * Native kernel (one byte walk, identical double-op order);
    * [[qualityScoreDeclarative]] is the pinned semantic reference.
    */
  def qualityScore(c: Column): Column = TextProfileFunctions.quality_score(c)

  /** The declarative quality-score formulation (slow: re-tokenizes per
    * term) — retained as the semantic reference for the kernel's
    * ScalaCheck equivalence property.
    */
  def qualityScoreDeclarative(c: Column): Column = {
    val nTok = tokenCount(c)
    val stopRatio = when(nTok === 0, lit(0.0))
      .otherwise(stopwordHits(c, "en").cast("double") / nTok)
    val punctRatio = when(length(c) === 0, lit(0.0))
      .otherwise(punctCount(c).cast("double") / length(c))
    val lengthTerm = least(nTok.cast("double") / 100.0, lit(1.0))
    stopRatio - punctRatio + lengthTerm
  }

  /** 64-hex-bit document fingerprint: md5 prefix (content-addressed,
    * engine-portable). For the rolling-hash variant see [[RollingHash]].
    */
  def fingerprintMd5(c: Column): Column = substring(md5(c), 1, 16)

  /** Word n-gram shingles (distinct) over whitespace tokens; empty
    * array when the text has fewer than n tokens. Native one-byte-walk
    * kernel: the declarative HOF form re-evaluated the regex split per
    * shingle index (4.3 s of minhash's 4.5 s at sf0.1) — see
    * [[ShingleKernels.wordShingles]]; [[wordShinglesDeclarative]] is
    * the semantic reference it is property-pinned against.
    */
  def wordShingles(c: Column, n: Int): Column =
    ShingleFunctions.word_shingles(c, n)

  /** The declarative shingle formulation (slow: the embedded split
    * re-evaluates per shingle) — retained as the semantic reference
    * for the kernel's ScalaCheck equivalence property.
    */
  def wordShinglesDeclarative(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }
}
