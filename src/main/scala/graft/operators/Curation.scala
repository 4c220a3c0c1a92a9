package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score-based corpus curation: keep the best `fraction` of rows per
  * stratum — the standard quality-filtering step of a training-data
  * pipeline (e.g. top 25% by quality score per language).
  *
  * Deterministic by construction: the rank orders by (score desc,
  * id asc), so ties cut identically in any engine at any parallelism,
  * and the kept count is an exact `ceil(fraction * n)` per stratum.
  *
  * Scale shape: [[topFraction]] is one shuffle on the stratum key,
  * with rank and stratum size from the same window partition — but
  * the window ships each stratum's FULL rows to one partition, which
  * a heavily skewed stratum turns into a straggler.
  * [[topFractionBounded]] is the skew-safe form: per-stratum counts
  * first (map-side combine), then the bounded top-k aggregate with
  * k = max over strata — each map task ships at most k (score, id)
  * pairs per stratum, wide rows never shuffle, and the final
  * per-stratum cut trims to each stratum's own ceil(fraction * n).
  * Both forms produce identical rows (unit-pinned).
  */
object Curation {

  /** Rows whose (scoreCol desc, idCol asc) rank within their stratum
    * is <= ceil(fraction * stratum size). Adds nothing, drops rows.
    */
  def topFraction(df: DataFrame, scoreCol: Column, strataCols: Seq[String],
      idCol: String, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction $fraction not in (0,1]")
    val strata = strataCols.map(col)
    val w = Window.partitionBy(strata: _*)
    val ranked = df
      .withColumn("__score", scoreCol)
      .withColumn("__rank", row_number().over(
        w.orderBy(col("__score").desc, col(idCol).asc)))
      .withColumn("__n", count(lit(1)).over(w))
    ranked
      .filter(col("__rank") <= ceil(col("__n") * fraction))
      .drop("__score", "__rank", "__n")
  }

  /** Skew-safe [[topFraction]]: bounded top-k aggregation instead of
    * a full-stratum window. Requires a long-typed `idCol` (the top-k
    * heap's id slot). Two narrow shuffles (counts + heaps) plus a
    * semi-join of the winners back to the full rows; at most
    * max-stratum-k (score, id) pairs per stratum per map task cross
    * the wire.
    *
    * Score note: the heap orders (score desc, id asc) on the DOUBLE
    * value of `scoreCol` — exact for integer scores up to 2^53 and
    * for genuinely-double scores; don't feed wider integers.
    */
  def topFractionBounded(df: DataFrame, scoreCol: Column,
      strataCols: Seq[String], idCol: String, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction $fraction not in (0,1]")
    val strata = strataCols.map(col)
    // the narrow frame is consumed by BOTH the counts pass (whose
    // maxK head() below is a synchronous driver action) and the heap
    // pass — cache it so an expensive upstream (e.g. the DSIR weights
    // pipeline) computes once, with the head() action populating the
    // cache for free. Skip when the caller already cached df: a
    // narrow select over a cached frame is a cheap scan, and a second
    // block-store copy would buy nothing.
    val narrowRaw = df.select(
      strata :+ scoreCol.cast("double").as("__score") :+ col(idCol): _*)
    val narrow =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        graft.core.OpCaches.persistTracked(narrowRaw)
      else narrowRaw
    val counts = narrow.groupBy(strata: _*)
      .agg(ceil(count(lit(1)) * fraction).cast("int").as("__k"))
    // an EMPTY input yields an empty result, not a driver error: max
    // over zero strata is NULL. Not hypothetical — a gate that passes
    // nothing, or an all-contaminated corpus (the r18 100x replica
    // corpus hit exactly this: ids stride 5000 ≡ 53 mod 97, coprime,
    // so every text had a copy in the doc_id%97 benchmark slice and
    // the curation pipeline's decontaminated frame was empty).
    val maxKRow = counts.agg(max(col("__k"))).head()
    if (maxKRow.isNullAt(0)) return df.limit(0)
    val maxK = maxKRow.getInt(0)
    val kept = narrow
      .groupBy(strata: _*)
      .agg(graft.functions.TopKFunctions
        .top_k(col("__score"), col(idCol), maxK).as("__top"))
      .join(counts, strataCols)
      .select(strata :+ posexplode(col("__top")) :+ col("__k"): _*)
      .filter(col("pos") < col("__k"))
      .select(col("col.id").as(idCol))
    df.join(kept, Seq(idCol), "left_semi")
  }

  /** [[topFractionBounded]] that returns the winning NARROW rows
    * `(strataCols…, scoreName, idCol)` directly from the heaps
    * instead of semi-joining ids back to the full frame — for
    * callers whose output IS the (strata, score, id) triple, this
    * removes the semi-join stage round entirely, and the
    * per-stratum cutoffs fold into the plan as literals from the
    * ONE driver collect (which doubles as the cache-population
    * action when `df` is cached), so the counts subtree vanishes
    * from the final job too. Row-identical to running
    * [[topFractionBounded]] and projecting the same columns
    * (OperatorsSuite pins it). `scoreName` must not collide with a
    * stratum column; scores surface as the DOUBLE the heap ordered
    * on (exact for integer scores up to 2^53 — same contract as the
    * joined form).
    *
    * The literal-cutoff dispatch is bounded by [[MaxLiteralStrata]];
    * wider stratum domains fall back to [[topFractionBounded]]'s
    * in-plan counts join projected to the same columns.
    */
  def topFractionBoundedNarrow(df: DataFrame, scoreCol: Column,
      strataCols: Seq[String], idCol: String, fraction: Double,
      scoreName: String = "score"): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction $fraction not in (0,1]")
    require(!strataCols.contains(scoreName) && scoreName != idCol,
      s"scoreName $scoreName collides with an output column")
    val strata = strataCols.map(col)
    val narrowRaw = df.select(
      strata :+ scoreCol.cast("double").as("__score") :+ col(idCol): _*)
    val narrow =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        graft.core.OpCaches.persistTracked(narrowRaw)
      else narrowRaw
    val ks = narrow.groupBy(strata: _*)
      .agg(ceil(count(lit(1)) * fraction).cast("int").as("__k")).collect()
    val maxK = ks.iterator.map(_.getInt(strataCols.length))
      .foldLeft(1)(math.max)
    if (ks.length > MaxLiteralStrata) {
      // wide stratum domain: a >256-branch literal CASE chain bloats
      // codegen, so fall back to the in-plan counts JOIN — but over
      // the SAME persisted narrow frame (an earlier form re-entered
      // topFractionBounded(df, ...), which built and persisted a
      // second identical narrow frame and recomputed the counts,
      // orphaning this one's cache). maxK from the collect above
      // still bounds the heaps.
      val counts = narrow.groupBy(strata: _*)
        .agg(ceil(count(lit(1)) * fraction).cast("int").as("__k"))
      return narrow.groupBy(strata: _*)
        .agg(graft.functions.TopKFunctions
          .top_k(col("__score"), col(idCol), maxK).as("__top"))
        .join(counts, strataCols)
        .select(strata :+ posexplode(col("__top")) :+ col("__k"): _*)
        .filter(col("pos") < col("__k"))
        .select(strata :+ col("col.score").as(scoreName) :+
          col("col.id").as(idCol): _*)
    }
    // per-stratum cutoff as one literal CASE chain over the stratum
    // key — no counts subtree, no join, in the final plan
    val kExpr = ks.foldLeft(lit(0)) { (acc, r) =>
      val cond = strataCols.zipWithIndex
        .map { case (c, i) => col(c) <=> lit(r.get(i)) }
        .reduce(_ && _)
      when(cond, lit(r.getInt(strataCols.length))).otherwise(acc)
    }
    narrow.groupBy(strata: _*)
      .agg(graft.functions.TopKFunctions
        .top_k(col("__score"), col(idCol), maxK).as("__top"))
      .select(strata :+ posexplode(col("__top")): _*)
      .filter(col("pos") < kExpr)
      .select(strata :+ col("col.score").as(scoreName) :+
        col("col.id").as(idCol): _*)
  }

  /** Stratum-count bound for [[topFractionBoundedNarrow]]'s literal
    * cutoff dispatch: past ~this many CASE branches the generated
    * filter bloats toward codegen method limits (the
    * [[graft.operators.Pq.MaxLiteralQueries]] lesson) and a
    * broadcast counts join is the right shape anyway.
    */
  val MaxLiteralStrata: Int = 256

  /** Token-budget curation: walking each stratum best-first
    * (scoreCol desc, idCol asc), keep rows while the running token
    * total stays within `budget` — the "data mixing" step that caps
    * each domain/source's contribution to a training corpus at a
    * token budget rather than a row count.
    *
    * The running total is an exact integer cumulative sum INCLUDING
    * the current row, so a row is kept iff it fits entirely; one
    * oversized row at the front of a stratum can exclude everything
    * after it only if it fits itself (budget semantics, not a greedy
    * knapsack). Adds `cum_tokens`.
    *
    * Scale shape: one shuffle on the stratum key; the window carries
    * only (strata, score, tokens, id)-width rows, then winners
    * semi-join back to the full rows — payload columns never enter
    * the sort. Deterministic at any parallelism: the order key is
    * total and the cumsum is integer-exact.
    */
  def tokenBudget(df: DataFrame, scoreCol: Column, tokensCol: Column,
      strataCols: Seq[String], idCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    val strata = strataCols.map(col)
    val narrow = df.select(
      strata :+ scoreCol.as("__score") :+
        tokensCol.cast("long").as("__tok") :+ col(idCol): _*)
    val w = Window.partitionBy(strata: _*)
      .orderBy(col("__score").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = narrow
      .withColumn("cum_tokens", sum(col("__tok")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col("cum_tokens"))
    df.join(kept, Seq(idCol))
  }

  /** Email pattern: local part, '@', dotted domain, 2+ letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 (word-bounded; no octet range check — redaction
    * errs toward masking).
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** International phone shape +CC-XXX-XXX-XXXX with '-' or ' '
    * separators — deliberately strict (a loose \\d{7,} pattern mauls
    * ids, timestamps, and numeric tables in real corpora).
    */
  val PhoneRe = "\\+\\d{1,2}[- ]\\d{3}[- ]\\d{3}[- ]\\d{4}"

  /** PII redaction: emails, then IPv4s, then phone numbers replaced
    * with typed placeholder tokens — the scrubbing step a public
    * training corpus goes through before anything else sees it.
    *
    * Stateless per-row expression (codegen'd regexp_replace chain):
    * no shuffle, fully pushdown-friendly, trivially parallel. The
    * patterns stay inside the Java/RE2 common subset (character
    * classes, \\d, \\b, bounded repetition) so the SAME regex text
    * runs identically in Spark and the SQL oracle (DuckDB needs the
    * 'g' flag for replace-all; Spark's regexp_replace is global by
    * default). Order matters and is fixed: an email is consumed
    * before its domain can be mistaken for anything else.
    *
    * Redaction is pattern-based, not NER: it masks well-formed
    * identifiers, not free-text names. Compose with upstream quality
    * filters, not instead of them.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Gopher-style composite quality gate (Rae et al., "Scaling
    * Language Models: ... Gopher", 2021, §A1.1): token-count bounds,
    * mean word length in [3, 10], duplicate-line COUNT fraction
    * ≤ 0.30, duplicate-line CHARACTER fraction ≤ 0.20, dominant-
    * 2-gram character fraction ≤ 0.20, repeated-5-gram character
    * fraction ≤ 0.15 (the cut-offs [[graft.functions.RepetitionKernel]]
    * documents). All six rules come from ONE
    * [[graft.functions.RepetitionFunctions.repetition_profile]] byte
    * walk per document (no explode, no shuffle), and every fraction
    * threshold is evaluated as a CROSS-MULTIPLIED exact-integer
    * comparison (`dup_chars * 10 <= chars * 3`, never a float
    * division) — bit-identical in any engine with no zero-denominator
    * guards needed.
    *
    * The published token bounds (50–100k words) are the defaults;
    * pass corpus-appropriate bounds where the distribution differs.
    *
    * FILTER CALLERS: use
    * [[graft.functions.RepetitionFunctions.gopher_keep]] instead of
    * `gopherGate(...).filter(keep === 1)` — predicate pushdown
    * rewrites a filter over this frame's keep column into a condition
    * referencing the profile kernel once per rule operand (up to
    * eight walks per row; GopherKeep's scaladoc has the r15 numbers).
    * This frame is for consumers that want the VERDICT as data.
    *
    * @return (idCol, keep) with keep ∈ {0, 1} as int
    */
  def gopherGate(docs: DataFrame, minTokens: Long = 50,
      maxTokens: Long = 100000, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minTokens <= maxTokens,
      s"minTokens $minTokens > maxTokens $maxTokens")
    // the profile MUST materialize through its own projection before
    // the eight extracts reference it: a single inlined expression
    // referencing p.getItem(0..7) runs the kernel up to EIGHT times
    // per row — CollapseProject deliberately refuses to inline a
    // non-cheap projection referenced more than once, and this
    // staged shape is what invokes that protection (r15
    // GateMicroProbe: the inlined form measured 16.4 s vs 0.37 s for
    // the staged walk at the 10x corpus — codegen subexpression
    // elimination does NOT rescue an inlined struct-producing call).
    val p = graft.functions.RepetitionFunctions.repetition_profile(col(textCol))
    docs.select(col(idCol), p.as("__p"))
      .select(col(idCol),
        col("__p").getItem(0).as("n_lines"),
        col("__p").getItem(1).as("n_dup_lines"),
        col("__p").getItem(2).as("dup_line_chars"),
        col("__p").getItem(3).as("line_chars"),
        col("__p").getItem(4).as("top2gram_chars"),
        col("__p").getItem(5).as("dup5gram_chars"),
        col("__p").getItem(6).as("n_tokens"),
        col("__p").getItem(7).as("token_chars"))
      .select(col(idCol),
        ((col("n_tokens") >= minTokens) &&
          (col("n_tokens") <= maxTokens) &&
          (col("token_chars") >= col("n_tokens") * 3) &&
          (col("token_chars") <= col("n_tokens") * 10) &&
          (col("n_dup_lines") * 10 <= col("n_lines") * 3) &&
          (col("dup_line_chars") * 5 <= col("line_chars")) &&
          (col("top2gram_chars") * 5 <= col("token_chars")) &&
          (col("dup5gram_chars") * 20 <= col("token_chars") * 3))
          .cast("int").as("keep"))
  }
}
