package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dsir, SubstringDedup}

/** Unit coverage for the two round-13 snapshot operators, pinned
  * against driver-side brute forces (the suites the oracle rows
  * cannot replace: tiny corpora with PLANTED structure, edge shapes
  * the sf tables never hit).
  */
class DsirSubstringSuite extends SparkSuite {
  import spark.implicits._

  /** First 48 bits of MD5(s), big-endian — HashKernels.md5Pair's h1,
    * re-derived independently (digest bytes, not the kernel).
    */
  private def h1(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (0 until 6).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
  }

  /** DSIR feature stream of one text: unigrams + bigrams ("a b"),
    * WITH multiplicity — Dsir.featuresOf re-derived on the driver.
    */
  private def feats(text: String): Seq[String] = {
    val ws = text.split("[ \t\n\r\f]+").filter(_.nonEmpty).toSeq
    ws ++ (if (ws.size >= 2) ws.sliding(2).map(_.mkString(" ")).toSeq
           else Seq.empty)
  }

  /** Brute-force importance weights: per-bucket Laplace-smoothed
    * frequencies, floor(1e9 ln ratio) quantized per occurrence,
    * summed per doc — the operator's documented math, computed with
    * plain Scala collections.
    */
  private def bruteWeights(raw: Seq[(Long, String)], target: Seq[String],
      buckets: Int): Map[Long, (Long, Double)] = {
    def bucketsOf(text: String): Seq[Long] =
      feats(text).map(f => h1(f) % buckets)
    val tCounts = target.flatMap(bucketsOf)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nT = tCounts.values.sum
    val rOcc = raw.map { case (id, t) => id -> bucketsOf(t) }
    val rCounts = rOcc.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nR = rCounts.values.sum
    rOcc.filter(_._2.nonEmpty).map { case (id, bs) =>
      val qsum = bs.map { b =>
        val pT = (tCounts.getOrElse(b, 0L) + 1.0) / (nT + buckets)
        val pR = (rCounts(b) + 1.0) / (nR + buckets)
        math.floor(1e9 * math.log(pT / pR)).toLong
      }.sum
      id -> (bs.size.toLong, qsum.toDouble / 1e9)
    }.toMap
  }

  test("dsir importance weights match a driver-side brute force (collision-heavy buckets)") {
    // B=64 forces bucket collisions, so the test exercises the
    // aggregated-count path, not one-feature-per-bucket
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the log"),
      (3L, "en", "cat dog cat dog cat"),
      (4L, "de", "der hund sitzt auf dem baum"),
      (5L, "de", "die katze schläft auf dem sofa"),
      (6L, "de", "the cat the cat the cat"), // target-like text, raw-only stratum
      (7L, "de", "einwort"), // one token: 1 unigram, 0 bigrams
      (8L, "de", " ")) // zero tokens: must be ABSENT from the output
      .toDF("doc_id", "lang", "text")
    val got = Dsir.importanceWeights(
        docs, docs.filter(col("lang") === "en"), buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = bruteWeights(
      Seq(1L -> "the cat sat on the mat", 2L -> "the dog sat on the log",
        3L -> "cat dog cat dog cat", 4L -> "der hund sitzt auf dem baum",
        5L -> "die katze schläft auf dem sofa", 6L -> "the cat the cat the cat",
        7L -> "einwort", 8L -> " "),
      Seq("the cat sat on the mat", "the dog sat on the log",
        "cat dog cat dog cat"),
      buckets = 64)
    assert(got.keySet == want.keySet, s"${got.keySet} != ${want.keySet}")
    assert(!got.contains(8L), "zero-token doc must not appear")
    want.foreach { case (id, (nf, lw)) =>
      assert(got(id)._1 == nf, s"doc $id n_feats ${got(id)._1} != $nf")
      assert(got(id)._2 == lw, s"doc $id logweight ${got(id)._2} != $lw")
    }
    // direction sanity (relative, not absolute: at B=64 a repetitive
    // doc's own occurrences inflate its raw-side counts, so even a
    // target-like doc can score below zero): the target-vocabulary
    // doc must still rank above both clearly off-target German docs
    assert(got(6L)._2 > got(4L)._2 && got(6L)._2 > got(5L)._2,
      (got(6L)._2, got(4L)._2, got(5L)._2))
  }

  test("dsir self-target form is row-identical to the two-frame form") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the log"),
      (3L, "de", "der hund sitzt auf dem baum"),
      (4L, "de", "the cat the cat the cat"),
      (5L, "de", "einwort"),
      (6L, "de", " ")).toDF("doc_id", "lang", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val general = rows(Dsir.importanceWeights(
      docs, docs.filter(col("lang") === "en"), buckets = 64))
    graft.core.OpCaches.release()
    val self = rows(Dsir.importanceWeightsSelf(
      docs, col("lang") === "en", buckets = 64))
    assert(self == general, s"$self != $general")
  }

  test("dsir smoothing: buckets the target never hit score through the +1 prior") {
    // default B=8192 with a handful of features: the off-target doc's
    // buckets are (almost surely) unseen by the target — c_t = 0 must
    // flow through coalesce + Laplace, not drop the rows. The exact
    // value is pinned by the brute force (which uses getOrElse(0)).
    val docs = Seq(
      (1L, "en", "alpha beta gamma"),
      (2L, "xx", "zebra quark xylophone")).toDF("doc_id", "lang", "text")
    val got = Dsir.importanceWeights(
        docs, docs.filter(col("lang") === "en"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = bruteWeights(
      Seq(1L -> "alpha beta gamma", 2L -> "zebra quark xylophone"),
      Seq("alpha beta gamma"), buckets = 8192)
    assert(got == want, s"$got != $want")
    // the unseen-bucket doc must score BELOW the in-target doc and
    // still be present with all 5 features (3 unigrams + 2 bigrams)
    assert(got(2L)._1 == 5L && got(2L)._2 < got(1L)._2, got)
  }

  private def spansOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  test("substring dedup recovers a planted cross-document duplicated region exactly") {
    // docs 1 and 2 share the 7-token run D1..D7; every other token is
    // unique to its doc, so no straddling window can be duplicated
    val docs = Seq(
      (1L, "a1 a2 a3 D1 D2 D3 D4 D5 D6 D7 a4 a5"),
      (2L, "b1 b2 D1 D2 D3 D4 D5 D6 D7 b3"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8")).toDF("doc_id", "text")
    val got = spansOf(SubstringDedup.duplicateSpans(docs, windowTokens = 3))
    // doc 1: run starts at token 4 (1-based) -> [4, 10]; doc 2: [3, 9]
    assert(got == Set((1L, 4L, 10L, 7L), (2L, 3L, 9L, 7L)), got)
  }

  test("substring dedup merges adjacent duplicated windows into one span") {
    // in doc 4 the duplicated windows X1X2X3 ([2,4]) and Y1Y2Y3 ([5,7])
    // touch (5 = 4+1) and must merge; the straddling windows carry
    // doc-4-only context and stay unique
    val docs = Seq(
      (4L, "f1 X1 X2 X3 Y1 Y2 Y3 f2"),
      (5L, "g1 X1 X2 X3 g2"),
      (6L, "h1 Y1 Y2 Y3 h2")).toDF("doc_id", "text")
    val got = spansOf(SubstringDedup.duplicateSpans(docs, windowTokens = 3))
    assert(got == Set(
      (4L, 2L, 7L, 6L), (5L, 2L, 4L, 3L), (6L, 2L, 4L, 3L)), got)
  }

  test("substring dedup flags an intra-document repeat as two spans") {
    // E1E2E3 occurs twice WITHIN doc 7 (nowhere else): both
    // occurrences are duplicated, and the gap (7..8) keeps them apart
    val docs = Seq(
      (7L, "c1 c2 c3 E1 E2 E3 c4 c5 E1 E2 E3 c6"),
      (8L, "u1 u2 u3 u4 u5")).toDF("doc_id", "text")
    val got = spansOf(SubstringDedup.duplicateSpans(docs, windowTokens = 3))
    assert(got == Set((7L, 4L, 6L, 3L), (7L, 9L, 11L, 3L)), got)
  }

  test("documents shorter than the window never appear; stats zero-fill the clean ones") {
    val docs = Seq(
      (1L, "D1 D2 D3 D4 x1"), // 5 tokens, dup run [1,4]
      (2L, "y1 D1 D2 D3 D4"), // dup run [2,5]
      (3L, "z1 z2 z3 z4 z5"), // long enough, no dups -> zero-fill row
      (4L, "w1 w2 w3")) // 3 tokens < window 4: absent EVERYWHERE
      .toDF("doc_id", "text")
    val spans = spansOf(SubstringDedup.duplicateSpans(docs, windowTokens = 4))
    assert(spans == Set((1L, 1L, 4L, 4L), (2L, 2L, 5L, 4L)), spans)
    val stats = SubstringDedup.duplicationStats(docs, windowTokens = 4)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(stats == Set(
      (1L, 5L, 4L, 0.8), (2L, 5L, 4L, 0.8), (3L, 5L, 0L, 0.0)), stats)
  }

  test("windowTokens domain: w=1 is word_freq, not substring dedup") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SubstringDedup.duplicateSpans(docs, windowTokens = 1)
    }
  }

  test("dsir weights and rowScore match the brute force on randomized corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // whitespace-heavy token soup: repeats force bucket collisions at
    // B=32, empties/edges exercise the nonempty-tokenize contract
    val piece = Gen.oneOf("a", "bb", "the", "Ω≈", "x1", " ", "\t", "\n", "")
    val genText = Gen.choose(0, 10).flatMap(k =>
      Gen.listOfN(k, piece).map(_.mkString(" ")))
    val params = Gen.Parameters.default
    for (round <- 0 until 3) {
      val texts = (0 until 24).flatMap(i =>
        genText.apply(params, Seed(round * 1000L + i)))
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val docs = rows.toDF("doc_id", "text")
      val pred = col("doc_id") % 3 === 0
      val want = bruteWeights(rows,
        rows.filter(_._1 % 3 == 0).map(_._2), buckets = 32)
      val got = Dsir.importanceWeightsSelf(docs, pred, buckets = 32)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == want, s"round $round: $got != $want")
      // the row-local fold (the streaming/serving scorer) computes
      // the same integers under the same model
      val qArr = Dsir.modelArraySelf(docs, pred, buckets = 32)
      val local = docs
        .select(col("doc_id"), Dsir.rowScore(col("text"), qArr, 32).as("s"))
        .filter(col("s.n_feats") > 0)
        .select(col("doc_id"), col("s.n_feats"),
          (col("s.qsum").cast("double") / lit(1e9)))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(local == want, s"round $round rowScore: $local != $want")
    }
  }

  test("dup screen: store-served equals inline keys; variants do not collide") {
    // one parquet path, two DIFFERENT corpus slices over it — the
    // store-collision shape the variant key exists for
    val boiler = (1 to 4).map(i => s"B$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $boiler a3"), (2L, s"c1 $boiler c2 c3"), // dup pair in slice A
      (3L, "u1 u2 u3 u4 u5 u6 u7"), (4L, "v1 v2 v3 v4 v5 v6"),
      (10L, s"probe start $boiler probe end"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-dupscreen").toString
    docs.write.mode("overwrite").parquet(path)
    val stored = docs.sparkSession.read.parquet(path)
    val sliceA = stored.filter(col("doc_id") < 5)    // contains the dup pair
    val sliceB = stored.filter(col("doc_id") >= 3)   // boiler occurs once only
    val batch = stored.filter(col("doc_id") === 10L)
    def marks(corpus: org.apache.spark.sql.DataFrame, variant: String) =
      SubstringDedup.dupScreenBatchPrebuilt(corpus, path, batch,
        windowTokens = 4, variant = variant)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gotA = marks(sliceA, "ltfive")
    // inline equivalent: batch windows semi-joined against inline keys
    val inlineA = SubstringDedup.windowKeys(batch, 4, "doc_id", "text")
      .join(SubstringDedup.duplicatedWindowKeys(sliceA, 4), Seq("h1", "h2"),
        "left_semi")
      .select(col("doc_id"), col("s"), (col("s") + 3L).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotA == inlineA && gotA.nonEmpty, s"$gotA vs $inlineA")
    assert(gotA == Set((10L, 3L, 6L)), gotA) // the one boilerplate window
    // slice B never duplicates the block — a colliding store entry
    // would wrongly return slice A's marks here
    assert(marks(sliceB, "gethree").isEmpty)
    // and the store round-trip is stable (second call reads the entry)
    assert(marks(sliceA, "ltfive") == gotA)
  }

  test("LM serving form: stored model scores equal the inline build, per-slice entries") {
    val docs = Seq(
      (0L, "the cat sat on the mat"), (1L, "the dog sat on the rug"),
      (2L, "a cat and a dog"), (3L, "the mat and the rug"),
      (4L, "cats are not dogs"), (5L, "the cat sat"),
      (10L, "the cat sat on the dog"), (11L, "entirely novel tokens here"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-lmserve").toString
    docs.write.mode("overwrite").parquet(path)
    val stored = spark.read.parquet(path)
    val refA = stored.filter(col("doc_id") <= 3)
    val refB = stored.filter(col("doc_id") >= 2 && col("doc_id") <= 5)
    val batch = stored.filter(col("doc_id") >= 10)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    def served(ref: org.apache.spark.sql.DataFrame, variant: String) =
      graft.operators.Lm.scoreBatchPrebuilt(ref, path, batch,
        topM = 1000, variant = variant)
        .collect().map(key).toSet
    def inline(ref: org.apache.spark.sql.DataFrame) = {
      val (lm, vocabDf) = graft.operators.Lm.bigramLmPlan(ref, topM = 1000)
      graft.operators.Lm.lmScoreWith(batch, lm, vocabDf)
        .collect().map(key).toSet
    }
    val gotA = served(refA, "lma")
    assert(gotA == inline(refA) && gotA.nonEmpty)
    // a DIFFERENT slice under a different variant must not collide
    // with A's store entry (the round-12 lesson)
    val gotB = served(refB, "lmb")
    assert(gotB == inline(refB) && gotB != gotA)
    // and the store round-trip is stable (second call reads the entry)
    assert(served(refA, "lma") == gotA)
    // empty variant is refused
    intercept[IllegalArgumentException] {
      graft.operators.Lm.storedBigramLm(refA, path)
    }
  }

  test("LM serving form: zero-bigram reference still serves (sentinel carries V)") {
    // A reference of single-token documents has a NONEMPTY vocabulary
    // but zero surviving bigrams. Before the sentinel row, the stored
    // model frame was empty, V was lost with it, and serving raised
    // 'empty stored LM model' where the inline build validly scores
    // every batch bigram as unknown (P = 1/V) — a degenerate-reference
    // divergence from the bit-identical contract. The sentinel
    // (s = NULL, v) keeps V in the store; this pins served == inline
    // on exactly that reference.
    val docs = Seq(
      (0L, "alpha"), (1L, "beta"), (2L, "gamma"),
      (10L, "alpha beta"), (11L, "gamma alpha novel"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-lmzero").toString
    docs.write.mode("overwrite").parquet(path)
    val stored = spark.read.parquet(path)
    val ref = stored.filter(col("doc_id") <= 2)
    val batch = stored.filter(col("doc_id") >= 10)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val served = graft.operators.Lm.scoreBatchPrebuilt(ref, path, batch,
      topM = 1000, variant = "zerobigram")
      .collect().map(key).toSet
    val (lm, vocabDf) = graft.operators.Lm.bigramLmPlan(ref, topM = 1000)
    val inline = graft.operators.Lm.lmScoreWith(batch, lm, vocabDf)
      .collect().map(key).toSet
    assert(served == inline && served.nonEmpty, s"served=$served inline=$inline")
    // both batch docs score (all-unknown bigrams), n_bigrams = 1 and 2
    assert(served.map(_._1) == Set(10L, 11L))
  }

  test("edge-whitespace documents equal their normalized twins (lm/dsir/substring convention pin)") {
    // The r14 lm-oracle co-edit moved operator AND oracle to the
    // nonempty-token convention in lockstep; this fixture pins the
    // exact inputs where the two conventions could diverge —
    // leading/trailing runs, doubled separators, tabs/newlines — by
    // asserting each text operator scores a messy document
    // IDENTICALLY to its whitespace-normalized twin. If either side
    // of a future co-edit drifts (e.g. an empty token slips back into
    // the stream), messy and clean stop agreeing here before any
    // oracle run can paper over it.
    val messy = "  alpha beta\t\tgamma   alpha beta \r\n"
    val clean = "alpha beta gamma alpha beta"
    val pair = Seq((1L, messy), (2L, clean)).toDF("doc_id", "text")

    // lm: same bigram events, same (n_bigrams, nll)
    val ref = Seq((100L, "alpha beta gamma"), (101L, "gamma alpha alpha beta"))
      .toDF("doc_id", "text")
    val (lm, vocabDf) = graft.operators.Lm.bigramLmPlan(ref)
    val nll = graft.operators.Lm.lmScoreWith(pair, lm, vocabDf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(nll.keySet == Set(1L, 2L) && nll(1L) == nll(2L), nll.toString)

    // dsir: same feature multiset under both the corpus-scale explode
    // scorer and the row-local serving fold
    val corpus = Seq((100L, "alpha beta gamma"), (101L, "gamma delta"),
      (1L, messy), (2L, clean)).toDF("doc_id", "text")
    val w = Dsir.importanceWeightsSelf(corpus, col("doc_id") >= 100L,
      buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(w(1L) == w(2L), w.toString)
    val qArr = Dsir.modelArraySelf(corpus, col("doc_id") >= 100L, buckets = 64)
    val rl = pair.select(col("doc_id"),
        Dsir.rowScore(col("text"), qArr, 64).as("sc"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1).toSeq).toMap
    assert(rl(1L) == rl(2L), rl.toString)

    // substring windows: identical (s, h1, h2) keys — token positions
    // count nonempty tokens only
    val keys = SubstringDedup.windowKeys(pair, 2, "doc_id", "text")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet)
      .toMap
    assert(keys(1L) == keys(2L) && keys(1L).nonEmpty, keys.toString)
  }
}
