package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.RepetitionKernel

/** Repetition-profile kernel: hand-computed goldens, edge cases, and a
  * randomized cross-check against an independent driver-side
  * implementation built from Scala collections (split/sliding/groupBy)
  * — the kernel is a single byte walk, the oracle here is the obvious
  * high-level spelling of the same conventions.
  */
class RepetitionSuite extends SparkSuite {

  private def profile(s: String): Seq[Long] = {
    val arr = RepetitionKernel.repetitionProfile(UTF8String.fromString(s))
    (0 until arr.numElements()).map(arr.getLong)
  }

  /** Independent reference: same documented conventions, collection
    * spelling. Lines keep empties; tokens are non-empty \s+ splits;
    * n-grams join with ' '; chars are code points.
    */
  private def reference(s: String): Seq[Long] = {
    def chars(x: String): Long = x.codePointCount(0, x.length).toLong
    val lines = s.split("\n", -1).toSeq
    val lineGroups = lines.groupBy(identity).values.toSeq
    val nLines = lines.size.toLong
    val nDupLines = lineGroups.filter(_.size > 1).map(_.size.toLong).sum
    val dupLineChars = lineGroups.filter(_.size > 1)
      .map(g => g.size * chars(g.head)).sum
    val lineChars = lineGroups.map(g => g.size * chars(g.head)).sum
    val toks = s.split("\\s+", -1).toSeq.filter(_.nonEmpty)
    def gramCounts(n: Int): Map[String, Int] =
      if (toks.size < n) Map.empty
      else toks.sliding(n).map(_.mkString(" ")).toSeq.groupBy(identity)
        .map { case (k, v) => k -> v.size }
    val top2 = gramCounts(2).map { case (g, c) => c * chars(g) }
      .maxOption.getOrElse(0L)
    val dup5 = gramCounts(5).collect { case (g, c) if c > 1 => c * chars(g) }.sum
    Seq(nLines, nDupLines, dupLineChars, lineChars, top2, dup5,
      toks.size.toLong, toks.map(chars).sum)
  }

  test("golden: duplicated lines and a dominant 2-gram") {
    // lines: "ab cd", "ab cd", "x" -> 3 lines, 2 dup instances of
    // "ab cd" (5 chars each); tokens: ab cd ab cd x; 2-grams:
    // "ab cd" x2 (5 chars), "cd ab" x1, "cd x" x1 -> top = 10
    assert(profile("ab cd\nab cd\nx") ==
      Seq(3L, 2L, 10L, 11L, 10L, 0L, 5L, 9L))
  }

  test("golden: repeated 5-gram") {
    val five = "a b c d e"
    val doc = s"$five $five" // tokens a b c d e a b c d e
    val p = profile(doc)
    // 5-grams: "a b c d e" twice (9 chars), the 5 bridging grams once
    assert(p(5) == 18L, s"dup5gram_chars: $p")
    assert(p(6) == 10L && p(7) == 10L)
  }

  test("edge cases: empty, blank, single token, unicode") {
    assert(profile("") == Seq(1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(profile("   ") == Seq(1L, 0L, 0L, 3L, 0L, 0L, 0L, 0L))
    assert(profile("hola") == Seq(1L, 0L, 0L, 4L, 0L, 0L, 1L, 4L))
    // é is 2 UTF-8 bytes, 1 code point; dup lines of "é é"; the
    // 2-gram "é é" (3 chars) occurs 3x across the line break -> 9
    assert(profile("é é\né é") ==
      Seq(2L, 2L, 6L, 6L, 9L, 0L, 4L, 4L))
    // \f and \x0B are separators (full \s set)
    assert(profile("a\fbc")(6) == 3L)
  }

  test("randomized: kernel matches the collection reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small word alphabet so duplicate lines and repeated n-grams
    // actually occur; separators cover \n runs and the full \s set
    val word = Gen.oneOf("a", "bb", "ccc", "dé", "e")
    val sep = Gen.oneOf(" ", "  ", "\n", "\t", "\n\n", " \n", "\f", "")
    val doc = for {
      n <- Gen.choose(0, 60)
      ws <- Gen.listOfN(n, word)
      ss <- Gen.listOfN(n, sep)
    } yield ws.zip(ss).map { case (w, s) => w + s }.mkString
    val params = Gen.Parameters.default
    val texts = (0 until 300).flatMap(i => doc.apply(params, Seed(7L + i)))
    texts.foreach { s =>
      assert(profile(s) == reference(s), s"doc=${s.replace("\n", "\\n")}")
    }
  }

  test("spark column: profile extracts match the kernel on sf0.001 docs") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf("sf0.001"))
    val got = docs.select(col("doc_id"),
        graft.functions.RepetitionFunctions.repetition_profile(col("text")).as("p"))
      .orderBy("doc_id").collect()
    val raw = docs.select(col("doc_id"), col("text")).orderBy("doc_id").collect()
    assert(got.length == raw.length && got.nonEmpty)
    got.zip(raw).foreach { case (g, r) =>
      val want = reference(r.getString(1))
      val have = g.getSeq[Long](1)
      assert(have == want, s"doc_id=${r.get(0)}")
    }
  }

  /** The six gate rules re-derived independently from the collection
    * [[reference]] profile — the property oracle for the single-walk
    * fold in [[RepetitionKernel.gopherKeep]].
    */
  private def keepReference(s: String, minTokens: Long, maxTokens: Long): Boolean = {
    val p = reference(s)
    val (nLines, nDupLines, dupLineChars, lineChars) = (p(0), p(1), p(2), p(3))
    val (top2, dup5, nTokens, tokenChars) = (p(4), p(5), p(6), p(7))
    nTokens >= minTokens && nTokens <= maxTokens &&
      tokenChars >= nTokens * 3 && tokenChars <= nTokens * 10 &&
      nDupLines * 10 <= nLines * 3 &&
      dupLineChars * 5 <= lineChars &&
      top2 * 5 <= tokenChars &&
      dup5 * 20 <= tokenChars * 3
  }

  test("randomized: gopher_keep fold matches the rule-by-rule reference and gopherGate") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // bounds chosen INSIDE the generated token-count range so both the
    // min and max token rules actually flip; word lengths straddle the
    // 3..10 avg-chars band; small pools make duplicate lines, dominant
    // 2-grams and repeated 5-grams all occur organically
    val (lo, hi) = (5L, 15L)
    val word = Gen.oneOf("a", "bb", "ccc", "dddd", "eeeeee",
      "ffffffff", "gggggggggggg", "ccc", "dddd")
    val sep = Gen.frequency(6 -> Gen.const(" "), 2 -> Gen.const("\n"),
      1 -> Gen.const("\t"), 1 -> Gen.const("\n\n"))
    val doc = for {
      n <- Gen.choose(0, 22) // straddles [5, 15]
      ws <- Gen.listOfN(n, word)
      ss <- Gen.listOfN(n, sep)
      // sometimes append a repeated block so dup-5-gram / dup-line
      // rules fire on long documents too
      rep <- Gen.oneOf("", "ccc dddd ccc dddd ccc\nccc dddd ccc dddd ccc")
    } yield ws.zip(ss).map { case (w, s) => w + s }.mkString + rep
    val params = Gen.Parameters.default
    val generated = (0 until 250).flatMap(i => doc.apply(params, Seed(23L + i)))
    // hand-built boundary docs: exact-equality edges of every rule
    val boundary = Seq(
      ("ccc " * 4).trim, // 4 tokens < lo
      ("ccc " * 5).trim, // 5 tokens, avg chars = 3 exactly (keep edge)
      ("bb " * 5).trim, // avg chars 2 < 3 (drop edge)
      ("ccc " * 15).trim, // 15 tokens = hi (keep edge)
      ("ccc " * 16).trim, // 16 tokens > hi
      ("gggggggggggg " * 6).trim, // avg chars 12 > 10
      // 10 lines, 3 duplicate instances: nDup*10 = 30 == nLines*3 (keep)
      (Seq.fill(3)("eeeeee") ++ (1 to 7).map(i => "dddd" + i)).mkString("\n"),
      // 10 lines, 4 duplicate instances: 40 > 30 (drop)
      (Seq.fill(4)("eeeeee") ++ (1 to 6).map(i => "dddd" + i)).mkString("\n"),
      // a guaranteed KEEP: 15 distinct 4-char tokens, one line — every
      // rule passes with margin (top2 = 9 chars, 45 <= tokenChars 60)
      (1 to 15).map(i => f"w$i%03d").mkString(" "))
    val texts = (generated ++ boundary).distinct
    // 1) the kernel fold matches the independent rule-by-rule oracle
    texts.foreach { s =>
      val got = RepetitionKernel.gopherKeep(UTF8String.fromString(s), lo, hi)
      assert(got == keepReference(s, lo, hi),
        s"fold diverged on doc=${s.replace("\n", "\\n")}")
    }
    // 2) through Spark, the filter-safe expression and the
    // profile-extract gate frame agree with each other AND the oracle
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    val viaKeep = df.filter(graft.functions.RepetitionFunctions
        .gopher_keep(col("text"), lo, hi))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaGate = graft.operators.Curation.gopherGate(df, lo, hi)
      .filter(col("keep") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = texts.zipWithIndex.collect {
      case (s, i) if keepReference(s, lo, hi) => i.toLong
    }.toSet
    assert(viaKeep == viaGate && viaKeep == expect)
    // the sweep must actually exercise both verdicts
    assert(expect.nonEmpty && expect.size < texts.size)
  }

  test("gopher_keep equals gopherGate's keep verdict on sf0.001 docs") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf("sf0.001"))
    // the single-walk filter-safe form and the profile-extract frame
    // must render the same verdict per document (same rules, same
    // integer arithmetic) — both at the published bounds and at the
    // corpus-tuned ones, where this corpus has keeps AND drops
    for ((lo, hi) <- Seq((25L, 100000L), (50L, 100000L), (1L, 40L))) {
      val viaKeep = docs.filter(graft.functions.RepetitionFunctions
          .gopher_keep(col("text"), lo, hi))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val viaGate = graft.operators.Curation.gopherGate(docs, lo, hi)
        .filter(col("keep") === 1)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(viaKeep == viaGate, s"bounds ($lo, $hi)")
    }
    // null text never keeps
    import spark.implicits._
    val n = Seq[(Long, String)]((1L, null)).toDF("doc_id", "text")
      .filter(graft.functions.RepetitionFunctions.gopher_keep(col("text")))
      .count()
    assert(n == 0)
  }
}
