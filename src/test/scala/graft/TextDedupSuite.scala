package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, HashKernels, TextFunctions}
import graft.operators.Dedup

class TextDedupSuite extends SparkSuite {
  import spark.implicits._

  def textDf(texts: (Long, String)*): DataFrame =
    texts.toDF("doc_id", "text")

  test("tokenCount: whitespace runs, blanks, empties") {
    val df = textDf(0L -> "a  b\tc", 1L -> "", 2L -> "   ", 3L -> "one")
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n"))
      .orderBy("doc_id")
    assertRowsEqual(df, Seq(Seq(0L, 3), Seq(1L, 0), Seq(2L, 0), Seq(3L, 1)))
  }

  test("bpeTokenCount: alpha runs, digit runs, punctuation marks") {
    val df = textDf(0L -> "ab 12, cd!")
      .select(TextFunctions.bpeTokenCount(col("text")).as("n"))
    assertRowsEqual(df, Seq(Seq(5))) // ab, 12, ",", cd, "!"
  }

  test("langId: stopword argmax with fixed tie order and und fallback") {
    val df = textDf(
      0L -> "the cat of a hat is here",
      1L -> "el perro la casa de los",
      2L -> "le chien les maisons est un",
      3L -> "der hund die katze und das",
      4L -> "xyzzy plugh")
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang"))
      .orderBy("doc_id")
    assertRowsEqual(df, Seq(
      Seq(0L, "en"), Seq(1L, "es"), Seq(2L, "fr"), Seq(3L, "de"), Seq(4L, "und")))
  }

  test("wordShingles: distinct 3-gram shingles; short text yields empty") {
    val got = textDf(0L -> "a b c d", 1L -> "a b")
      .select(col("doc_id"), TextFunctions.wordShingles(col("text"), 3).as("sh"))
      .orderBy("doc_id").collect()
    assert(got(0).getSeq[String](1) == Seq("a b c", "b c d"))
    assert(got(1).getSeq[String](1) == Seq.empty)
  }

  test("rolling hash and simhash: known vectors and invariants") {
    // FNV-1a("a") is a published test vector; a single-token simhash
    // IS that token's hash (every bit majority is the bit itself).
    assert(HashKernels.fnv1a64("a".getBytes("UTF-8"), 0, 1) == 0xaf63dc4c8601ec8cL)
    val df = textDf(0L -> "a", 1L -> "", 2L -> "spark spark spark")
      .select(col("doc_id"),
        HashFunctions.rolling_hash(col("text")).as("rh"),
        HashFunctions.simhash64(col("text")).as("sh"))
      .orderBy("doc_id").collect()
    assert(df(0).getLong(2) == 0xaf63dc4c8601ec8cL) // simhash("a") = fnv1a("a")
    assert(df(0).getLong(1) == 'a'.toLong)           // rolling_hash("a") = byte value
    assert(df(1).getLong(1) == 0L)                   // empty string -> 0
    // deterministic across evaluation paths (interpreted vs codegen)
    val again = textDf(2L -> "spark spark spark")
      .select(HashFunctions.simhash64(col("text"))).first().getLong(0)
    assert(again == df(2).getLong(2))
  }

  test("simhash_md5: known vectors, whitespace walk, md5 bit parity") {
    // single token: every bit majority IS that token's md5 prefix —
    // md5("a") = 0cc175b9..., first 64 bits = 0x0cc175b9c0f1b6a8
    val df = textDf(0L -> "a", 1L -> "", 2L -> "  a \t a\na  ", 3L -> "b a")
      .select(col("doc_id"), HashFunctions.simhash_md5(col("text")).as("sh"))
      .orderBy("doc_id").collect()
    assert(df(0).getLong(1) == 0x0cc175b9c0f1b6a8L)
    assert(df(1).getLong(1) == 0L)                  // no tokens -> all-zero sig
    assert(df(2).getLong(1) == 0x0cc175b9c0f1b6a8L) // repeats + mixed whitespace
    // single-token sig equals the SQL-expressible md5-prefix formula
    // (the contract the DuckDB oracle relies on)
    val viaSql = textDf(0L -> "a")
      .select(conv(substring(md5(col("text")), 1, 16), 16, 10).cast("long"))
      .first().getLong(0)
    assert(df(0).getLong(1) == viaSql)
    // order-insensitive (bag-of-tokens majority vote)
    val ab = textDf(0L -> "a b")
      .select(HashFunctions.simhash_md5(col("text"))).first().getLong(0)
    assert(df(3).getLong(1) == ab)
  }

  test("md5_pair equals the hex conv formulation exactly") {
    val df = textDf(0L -> "a", 1L -> "some shingle text", 2L -> "")
      .select(col("doc_id"),
        HashFunctions.md5_pair(col("text")).as("hp"),
        conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long").as("c1"),
        conv(substring(md5(col("text")), 13, 12), 16, 10).cast("long").as("c2"))
      .collect()
    df.foreach { r =>
      val hp = r.getSeq[Long](1)
      assert(hp(0) == r.getLong(2) && hp(1) == r.getLong(3),
        s"mismatch for doc ${r.getLong(0)}: $hp vs (${r.getLong(2)}, ${r.getLong(3)})")
    }
  }

  test("hamming64 counts differing bits") {
    val d = spark.range(1)
      .select(HashFunctions.hamming64(lit(0L), lit(-1L)).as("h"))
      .first().getInt(0)
    assert(d == 64)
  }

  test("planted near-duplicates: recall across the whole dedup stack") {
    // 400 base docs over a 200-word vocabulary + 60 planted near-dups
    // (one token substituted out of ~40) — a corpus with KNOWN ground
    // truth, larger and more diverse than the oracle fixtures. Seeded,
    // so the measured recalls are pinned numbers, not flakes.
    val rnd = new scala.util.Random(13)
    val vocab = Array.tabulate(200)(i => s"w$i")
    def doc(): String =
      Seq.fill(40)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val bases = Seq.tabulate(400)(i => (i.toLong, doc()))
    val planted = (0 until 60).map { j =>
      val (baseId, text) = bases(rnd.nextInt(bases.length))
      val toks = text.split(" ")
      toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.length))
      (1000L + j, toks.mkString(" "), baseId)
    }
    val docs = (bases ++ planted.map(p => (p._1, p._2))).toDF("doc_id", "text")
    val truePairs = planted.map(p => (math.min(p._3, p._1), math.max(p._3, p._1))).toSet

    // minhash+LSH: one token of ~40 changed -> jaccard ~0.85; with
    // 16 hashes / 4 bands the banding theory gives P(candidate) ~
    // 1-(1-s^4)^4 ~ 0.97 at s=0.85 — require >= 0.9 measured
    val mh = Dedup.minHashCandidates(docs)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mhRecall = truePairs.count(mh.contains).toDouble / truePairs.size
    assert(mhRecall >= 0.9, s"minhash recall $mhRecall")

    // exact n-gram jaccard at 0.5 must find EVERY planted pair (one
    // substituted token kills <= 3 of ~38 shingles -> jaccard ~0.85)
    // and report jaccard >= 0.8 for them
    val nj = Dedup.ngramJaccardPairs(docs, minJaccard = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val njRecall = truePairs.count(nj.contains).toDouble / truePairs.size
    assert(njRecall == 1.0, s"ngram recall $njRecall")
    truePairs.foreach(p => assert(nj(p) >= 0.75, s"$p jaccard ${nj(p)}"))

    // simhash at hamming <= 3: banding is exhaustive at this radius,
    // so every miss is a DISTANCE miss, not a blocking miss. On
    // 40-token docs a one-token substitution shifts all 64 majority
    // votes by +/-2, flipping the low-margin bits — measured recall
    // 0.62 (pinned as a floor): simhash is the coarse/cheap filter of
    // the stack, minhash/ngram the sensitive ones. (Real corpora with
    // longer docs have larger vote margins and higher recall.)
    val sh = Dedup.simHashPairs(docs, maxHamming = 3,
      signature = HashFunctions.simhash_md5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val shRecall = truePairs.count(sh.contains).toDouble / truePairs.size
    assert(shRecall >= 0.55, s"simhash recall $shRecall")

    // precision guard: every reported pair must be a planted pair or
    // a SIBLING pair (two near-dups of the same base are near-dups of
    // each other) — independent 40-token docs over 200 words must not
    // collide
    val siblings = planted.groupBy(_._3).values.flatMap { g =>
      for (a <- g; b <- g if a._1 < b._1) yield (a._1, b._1)
    }.toSet
    val unexpected = nj.keySet -- truePairs -- siblings
    assert(unexpected.isEmpty, unexpected.take(5))
  }

  test("exactClusters / dedupExact") {
    val docs = textDf(0L -> "same text", 1L -> "same text", 2L -> "other", 3L -> "same text")
    val clusters = Dedup.exactClusters(docs).orderBy("doc_id")
    assertRowsEqual(clusters.select("doc_id", "keeper", "cluster_size", "is_dup"), Seq(
      Seq(0L, 0L, 3L, 0), Seq(1L, 0L, 3L, 1), Seq(2L, 2L, 1L, 0), Seq(3L, 0L, 3L, 1)))
    val kept = Dedup.dedupExact(docs).orderBy("doc_id").select("doc_id")
    assertRowsEqual(kept, Seq(Seq(0L), Seq(2L)))
  }

  test("minHashCandidates finds near-identical docs, skips unrelated") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = textDf(
      0L -> base,
      1L -> (base + " tomorrow"),                 // near-dup of 0
      2L -> "completely different words appear in this unrelated document text")
    val pairs = Dedup.minHashCandidates(docs).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.contains((0L, 1L)), s"expected (0,1) in ${pairSet}")
    assert(!pairSet.exists(p => p._1 == 2L || p._2 == 2L))
    val est = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get.getDouble(2)
    assert(est > 0.5 && est <= 1.0)
  }

  test("ngramJaccardPairs computes the exact jaccard") {
    // doc0: shingles {a b c, b c d}; doc1: {a b c}; jaccard = 1/2
    val docs = textDf(0L -> "a b c d", 1L -> "a b c")
    val got = Dedup.ngramJaccardPairs(docs, minJaccard = 0.0).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 0L && got.head.getLong(1) == 1L)
    assert(got.head.getDouble(2) == 0.5)
  }

  test("ngramJaccardPairsPostings is output-identical to ngramJaccardPairs") {
    // seeded corpus with planted near-dups, exercised with and
    // without the df cap — the posting-list form must emit exactly
    // the same (id_a, id_b, jaccard) rows as the self-join form
    val rnd = new scala.util.Random(29)
    val vocab = Array.tabulate(80)(i => s"w$i")
    def doc(): String =
      Seq.fill(25)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val bases = Seq.tabulate(120)(i => (i.toLong, doc()))
    val planted = (0 until 20).map { j =>
      val toks = bases(rnd.nextInt(bases.length))._2.split(" ")
      toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(vocab.length))
      (500L + j, toks.mkString(" "))
    }
    val docs = (bases ++ planted).toDF("doc_id", "text")
    for (cap <- Seq(None, Some(4))) {
      val a = Dedup.ngramJaccardPairs(docs, minJaccard = 0.3, maxDocFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      val b = Dedup.ngramJaccardPairsPostings(docs, minJaccard = 0.3, maxDocFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      assert(a.nonEmpty, "fixture produced no pairs — test is vacuous")
      assert(a.sameElements(b), s"cap=$cap: ${a.take(3).toSeq} vs ${b.take(3).toSeq}")
    }
  }

  test("simHashPairs: identical docs at hamming 0") {
    val docs = textDf(0L -> "alpha beta gamma delta", 1L -> "alpha beta gamma delta",
      2L -> "entirely unrelated content here now")
    val got = Dedup.simHashPairs(docs, maxHamming = 3).collect()
    assert(got.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L && r.getInt(2) == 0))
  }

  test("contaminatedDocs flags exactly the docs sharing an 8-gram with the benchmark") {
    val bench = Seq((100L, "q w e r t y u i")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "start pad q w e r t y u i end pad"), // contains the 8-gram
      (2L, "q w e r t y u x totally different"), // 7-gram prefix only
      (3L, "short text")).toDF("doc_id", "text")
    val got = Dedup.contaminatedDocs(corpus, bench)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }

  test("contaminatedDocsBloom equals the broadcast form; empty benchmark flags nothing") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val bench = docs.filter(col("doc_id") % 97 === 1)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = asMap(Dedup.contaminatedDocs(docs, bench))
    val bloom = asMap(Dedup.contaminatedDocsBloom(docs, bench))
    assert(bloom == exact)
    assert(exact.nonEmpty, "vacuous benchmark slice")
    // tiny sketch (high FP rate) still exact — FPs only widen the probe
    val tiny = asMap(Dedup.contaminatedDocsBloom(docs, bench, expectedGrams = 8))
    assert(tiny == exact)
    val none = Dedup.contaminatedDocsBloom(docs, docs.filter(lit(false)))
    assert(none.count() == 0)
  }

  test("incremental minhash == full run restricted to pairs touching the batch") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val full = Dedup.minHashCandidates(docs).collect().map(key).toSet
    graft.core.OpCaches.release()
    val isNew = (id: Long) => id % 5 == 0
    val inc = Dedup.incrementalMinHashCandidates(
      docs.filter(col("doc_id") % 5 === 0),
      docs.filter(col("doc_id") % 5 =!= 0)).collect().map(key).toSet
    assert(inc == full.filter(p => isNew(p._1) || isNew(p._2)))
    assert(inc.nonEmpty, "vacuous split — adjust the batch predicate")
    // the invariant the ingest pipeline relies on: no corpus-corpus pair
    assert(inc.forall(p => isNew(p._1) || isNew(p._2)))
  }

  test("prebuilt incremental minhash equals the inline form") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val inline = Dedup.incrementalMinHashCandidates(
      docs.filter(col("doc_id") % 5 === 0),
      docs.filter(col("doc_id") % 5 =!= 0)).collect().map(key).toSet
    graft.core.OpCaches.release()
    val served = Dedup.incrementalMinHashCandidatesPrebuilt(
      docs.filter(col("doc_id") % 5 =!= 0), s"$dir/documents.parquet",
      docs.filter(col("doc_id") % 5 === 0), variant = "holdout5-test")
      .collect().map(key).toSet
    assert(served == inline && served.nonEmpty,
      s"served ${served.size} != inline ${inline.size}")
    graft.core.OpCaches.release()
    // second call serves from the store entry and still agrees
    val again = Dedup.incrementalMinHashCandidatesPrebuilt(
      docs.filter(col("doc_id") % 5 =!= 0), s"$dir/documents.parquet",
      docs.filter(col("doc_id") % 5 === 0), variant = "holdout5-test")
      .collect().map(key).toSet
    assert(again == inline)
  }

  test("prebuilt v2 collapsed minhash index serves identically to the raw index and inline forms") {
    // the r19 serving-side collapse: a copy-heavy CORPUS banded into a
    // raw stored index reproduces the copies² probe the inline form
    // escaped in r18, so the prebuilt twin routes to a distinct-content
    // index (rep bands + membership) behind the same duplicate-mass
    // gate — stamped once at build, zero probe jobs per serving call
    val tmp = java.nio.file.Files.createTempDirectory("graft-mhv2").toFile
    val src = new java.io.File(tmp, "corpus.parquet").getPath
    val a = "the quick brown fox jumps over the lazy dog and runs far away today"
    val b = "pack my box with five dozen liquor jugs before the long trip home now"
    // adversarial corpus: a dup group also present in the batch (mixed
    // group), an all-corpus dup group, a shingle-less dup straddling
    // the split, a null text — duplicate mass well above the gate
    Seq((1L, a), (3L, a), (5L, a),
      (2L, b), (4L, b), (6L, b),
      (20L, "two words"),
      (30L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(src)
    val corpus = spark.read.parquet(src)
    val newDocs = Seq(
      (101L, a), (103L, a),              // batch members of the mixed group
      (110L, a + " extra"),              // batch near-dup of it
      (115L, b + " indeed"),             // batch near-dup of the corpus-only group
      (120L, "two words"),               // shingle-less
      (130L, null.asInstanceOf[String]),
      (140L, "completely different content about spark catalyst plan rules"))
      .toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 16).toInt)
    def served(gate: Double, force: Boolean = false) =
      Dedup.incrementalMinHashCandidatesPrebuilt(corpus, src, newDocs,
        variant = "advtest", force = force, dupGate = gate)
    val inline = Dedup.incrementalMinHashCandidates(newDocs, corpus)
      .collect().map(key).toSet
    graft.core.OpCaches.release()
    val direct = served(gate = 1.0, force = true).collect().map(key).toSet
    graft.core.OpCaches.release()
    val collapsed = served(gate = -1.0).collect().map(key).toSet
    graft.core.OpCaches.release()
    assert(direct == inline && inline.nonEmpty)
    assert(collapsed == inline,
      s"collapsed ${collapsed.size} != inline ${inline.size}")
    // mixed-group expansion reaches batch-batch AND batch-corpus pairs
    // at estimate 1.0; corpus-corpus pairs stay suppressed
    assert(inline.contains((101L, 103L, 16)) && inline.contains((1L, 101L, 16)))
    assert(!inline.exists(p => p._1 == 1L && p._2 == 3L))
    // the default gate reads the stamped fraction (this corpus is 5/7
    // duplicate mass) and routes the collapsed index — visible through
    // the membership entry's rep_id in the analyzed plan
    assert(Dedup.storedDupFraction(corpus, src, "text", "doc_id",
      "advtest", force = false) > Dedup.DefaultDupGate)
    val routed = served(gate = Dedup.DefaultDupGate)
    assert(routed.queryExecution.analyzed.toString.contains("rep_id"))
    assert(routed.collect().map(key).toSet == inline)
    graft.core.OpCaches.release()
    // empty batch: both routes return zero rows with the schema intact
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    for (gate <- Seq(-1.0, 2.0)) {
      val e = Dedup.incrementalMinHashCandidatesPrebuilt(corpus, src,
        empty, variant = "advtest", dupGate = gate)
      assert(e.columns.toSeq == Seq("id_a", "id_b", "est_jaccard"))
      assert(e.count() == 0)
    }
    graft.core.OpCaches.release()
    // a duplicate-light corpus routes DIRECT under the default gate
    val lightSrc = new java.io.File(tmp, "light.parquet").getPath
    (0L until 40L).map(i =>
      (i, s"unique document number $i with plenty of distinct words $i here"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(lightSrc)
    val light = spark.read.parquet(lightSrc)
    val lightBatch = Seq((100L,
      "unique document number 7 with plenty of distinct words 7 here"))
      .toDF("doc_id", "text")
    val lightServed = Dedup.incrementalMinHashCandidatesPrebuilt(light,
      lightSrc, lightBatch, variant = "lighttest", force = true)
    assert(!lightServed.queryExecution.analyzed.toString.contains("rep_id"),
      "duplicate-light corpus must keep the raw-index serving path")
    assert(lightServed.collect().map(key).toSet ==
      Dedup.incrementalMinHashCandidates(lightBatch, light)
        .collect().map(key).toSet)
    graft.core.OpCaches.release()
  }

  test("lm perplexity: in-domain text scores lower nll than out-of-domain") {
    import graft.operators.Lm
    val ref = (0L until 20L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val (lm, vocab) = Lm.bigramLm(ref)
    assert(vocab == 10) // the, quick, brown, fox, jumps, over, lazy, dog, again, and
    val docs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // in-domain
      (101L, "dog lazy the over jumps fox brown quick the"), // same tokens, wrong order
      (102L, "zx qy wv ut"), // fully unknown
      (103L, "one"), (104L, " ")) // no bigrams -> no row
      .toDF("doc_id", "text")
    val got = Lm.lmScore(docs, lm, vocab).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set(100L, 101L, 102L))
    assert(got(100L)._2 < got(101L)._2, s"order must matter: $got")
    // every reversed bigram is out-of-model, so it rates exactly the
    // flat unknown backoff — the same as full gibberish
    assert(got(101L)._2 == got(102L)._2, s"unknown backoff is flat: $got")
    assert(got(102L)._2 == -math.floor(1e9 * math.log(1.0 / vocab)) / 1e9,
      s"gibberish = quantized ln V: $got")
    // multiplicity counts: a doubled in-domain bigram is no penalty
    assert(got(100L)._1 == 8)
  }

  test("lm perplexity: plan-form vocabulary scores bit-identically to the driver form") {
    import graft.operators.Lm
    val ref = (0L until 20L).map(i =>
      (i, s"alpha beta gamma delta epsilon token$i beta gamma"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (100L, "alpha beta gamma"), (101L, "beta gamma delta epsilon"),
      (102L, "unknown words only here"), (103L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val (lmA, vocab) = Lm.bigramLm(ref)
    val driver = Lm.lmScore(docs, lmA, vocab)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    graft.core.OpCaches.release()
    val (lmB, vocabDf) = Lm.bigramLmPlan(ref)
    val planned = Lm.lmScoreWith(docs, lmB, vocabDf)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(planned == driver, s"plan-form diverges: $planned vs $driver")
    graft.core.OpCaches.release()
    // the in-plan guard still fails loudly on an empty reference
    val err = intercept[Exception] {
      val (lmE, vE) = Lm.bigramLmPlan(ref.filter($"doc_id" < 0))
      Lm.lmScoreWith(docs, lmE, vE).collect()
    }
    assert(err.getMessage.contains("empty reference vocabulary"),
      s"wrong failure: $err")
  }

  test("neardupComponents: exact-collapse equals the uncollapsed composition") {
    // the uncollapsed reference: components over minhash candidates of
    // ALL docs, absent docs as self-labeled singletons — exactly the
    // pre-r17 neardup_clusters shape
    def reference(docs: DataFrame): Seq[(Long, Long)] = {
      val comp = graft.operators.Components.connectedComponents(
        Dedup.minHashCandidates(docs))
      docs.join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("label"), col("doc_id")).as("label"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    }
    // dupGate = -1 FORCES the collapse path: the default gate would
    // route duplicate-light frames (like sf0.001 documents below) to
    // the direct composition and make this pin vacuous
    def collapsed(docs: DataFrame): Seq[(Long, Long)] =
      Dedup.neardupComponents(docs, dupGate = -1.0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

    // adversarial frame: two exact-dup groups (one 5-copy hot group),
    // a near-dup bridging both base texts, unrelated docs, identical
    // SHINGLE-LESS docs (must stay separate singletons), a null text
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "pack my box with five dozen liquor jugs for the long trip"
    val hot = (10L to 14L).map(i => (i, a))
    val dupB = Seq((20L, b), (21L, b))
    val bridge = Seq((30L,
      "the quick brown fox jumps over the lazy dog again and often"))
    val rest = Seq(
      (40L, "completely unrelated content about databases and queries"),
      (41L, "x y"), (42L, "x y"), // < 3 tokens: no shingles, stay apart
      (43L, null.asInstanceOf[String]))
    val docs = (hot ++ dupB ++ bridge ++ rest).toDF("doc_id", "text")
    val got = collapsed(docs)
    assert(got == reference(docs))
    // the hot group resolved to one component under its min id
    assert(got.filter(t => t._1 >= 10L && t._1 <= 14L).map(_._2).distinct == Seq(10L))
    // shingle-less identical docs are separate singletons
    assert(got.find(_._1 == 41L).get._2 == 41L)
    assert(got.find(_._1 == 42L).get._2 == 42L)
    assert(got.find(_._1 == 43L).get._2 == 43L)

    // and on real data: sf0.001 documents
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(collapsed(real) == reference(real))
  }

  test("simHashPairsCollapsed is output-identical to simHashPairs") {
    import graft.functions.HashFunctions.simhash_md5
    def pairs(df: DataFrame, form: (DataFrame, String, String, Int,
        org.apache.spark.sql.Column => org.apache.spark.sql.Column) => DataFrame) =
      form(df, "text", "doc_id", 3, simhash_md5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSeq.sorted
    // dupGate = -1 forces the collapse path (the default gate would
    // route duplicate-light frames to the direct form, voiding the pin)
    def collapsedForced(df: DataFrame, t: String, i: String, h: Int,
        sig: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      Dedup.simHashPairsCollapsed(df, t, i, h, sig, dupGate = -1.0)
    // adversarial frame: a 5-copy dup group with ids INTERLEAVED with
    // another group's (least/greatest orientation under test), a
    // near-dup within hamming 3 of the first text, identical empty
    // texts (signature 0 — they pair), null texts (no signature — they
    // must not), an unrelated far text
    val a = "the quick brown fox jumps over the lazy dog and runs far away today"
    val b = "pack my box with five dozen liquor jugs before the long trip home now"
    val docs = Seq(
      (1L, a), (3L, a), (5L, a), (7L, a), (9L, a), // group A, odd ids
      (2L, b), (4L, b), (6L, b),                   // group B interleaved
      (10L, a + " x"),                             // near-dup of A (maybe <= 3 bits)
      (20L, ""), (21L, ""),                        // empty-text dups: sig 0, pair
      (30L, null.asInstanceOf[String]), (31L, null.asInstanceOf[String]),
      (40L, "completely different content about spark catalyst plans"))
      .toDF("doc_id", "text")
    val ref = pairs(docs, Dedup.simHashPairs(_, _, _, _, _))
    val got = pairs(docs, collapsedForced)
    assert(got == ref)
    // the dup groups themselves must be present (sanity that the
    // frame exercises the expansion, not just equality of emptiness)
    assert(ref.contains((1L, 3L, 0)) && ref.contains((2L, 4L, 0))
      && ref.contains((20L, 21L, 0)))
    assert(!ref.exists(p => p._1 == 30L || p._2 == 30L || p._1 == 31L || p._2 == 31L),
      "null-text docs must produce no pairs")

    // real data equivalence: sf0.001 documents
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(pairs(real, collapsedForced) ==
      pairs(real, Dedup.simHashPairs(_, _, _, _, _)))
  }

  test("minHashCandidatesCollapsed is output-identical to minHashCandidates") {
    def pairs(df: DataFrame, form: DataFrame => DataFrame) =
      form(df).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 16).toInt))
        .toSeq.sorted
    // dupGate = -1 forces the collapse path (the default gate would
    // route duplicate-light frames to the direct form, voiding the pin)
    def collapsedForced(df: DataFrame) =
      Dedup.minHashCandidatesCollapsed(df, dupGate = -1.0)
    def direct(df: DataFrame) = Dedup.minHashCandidates(df)
    // adversarial frame: a 5-copy dup group with ids INTERLEAVED with
    // another group's (least/greatest orientation under test), a
    // near-dup sharing most of the first text's shingles, identical
    // SHINGLE-LESS texts (< 3 tokens: no signature in either form —
    // the spot where minhash differs from simhash, whose empty-text
    // signature is 0 and pairs), null texts, an unrelated far text
    val a = "the quick brown fox jumps over the lazy dog and runs far away today"
    val b = "pack my box with five dozen liquor jugs before the long trip home now"
    val docs = Seq(
      (1L, a), (3L, a), (5L, a), (7L, a), (9L, a), // group A, odd ids
      (2L, b), (4L, b), (6L, b),                   // group B interleaved
      (10L, a + " extra"),                         // near-dup of A
      (20L, "two words"), (21L, "two words"),      // shingle-less dups
      (30L, null.asInstanceOf[String]), (31L, null.asInstanceOf[String]),
      (40L, "completely different content about spark catalyst plan rules"))
      .toDF("doc_id", "text")
    val ref = pairs(docs, direct)
    val got = pairs(docs, collapsedForced)
    assert(got == ref)
    // the dup groups must be present at est_jaccard 1.0 (sanity that
    // the frame exercises the expansion, not equality of emptiness)
    assert(ref.contains((1L, 3L, 16)) && ref.contains((2L, 4L, 16)))
    assert(!ref.exists(p => Seq(20L, 21L, 30L, 31L).exists(
      i => p._1 == i || p._2 == i)),
      "shingle-less and null-text docs must produce no pairs")

    // real data equivalence: sf0.001 documents
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    assert(pairs(real, collapsedForced) == pairs(real, direct))

    // threshold-boundary routing, via the rep_id plan discriminator
    // (same convention as the simhash/neardup gate test)
    val copies = (0L until 200L)
      .map(i => (i, s"copied text number ${i % 20} repeated quite enough times"))
      .toDF("doc_id", "text")
    val f = Dedup.duplicateMassFraction(copies, "text")
    def usesCollapse(df: DataFrame): Boolean =
      df.queryExecution.analyzed.toString.contains("rep_id")
    val atGate = Dedup.minHashCandidatesCollapsed(copies, dupGate = f)
    val belowGate = Dedup.minHashCandidatesCollapsed(copies, dupGate = f - 1e-9)
    assert(!usesCollapse(atGate), "fraction == gate must route direct")
    assert(usesCollapse(belowGate), "fraction > gate must route collapsed")
    assert(pairs(copies, _ => atGate) == pairs(copies, _ => belowGate))
  }

  test("incrementalMinHashCandidatesCollapsed is output-identical to the direct form") {
    def pairs(nd: DataFrame, c: DataFrame,
        form: (DataFrame, DataFrame) => DataFrame) =
      form(nd, c).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 16).toInt))
        .toSeq.sorted
    def collapsedForced(nd: DataFrame, c: DataFrame) =
      Dedup.incrementalMinHashCandidatesCollapsed(nd, c, dupGate = -1.0)
    def direct(nd: DataFrame, c: DataFrame) =
      Dedup.incrementalMinHashCandidates(nd, c)
    // adversarial frame: dup groups SPLIT across batch and corpus
    // (within-group pairs must touch the batch: batch-batch and
    // batch-corpus yes, corpus-corpus no), an all-corpus dup group
    // (only cross pairs against a new near-dup may surface it), a
    // batch near-dup of a corpus group, shingle-less dups straddling
    // the split, nulls, an unrelated text
    val a = "the quick brown fox jumps over the lazy dog and runs far away today"
    val b = "pack my box with five dozen liquor jugs before the long trip home now"
    val newDocs = Seq(
      (101L, a), (103L, a),              // batch members of group A
      (110L, a + " extra"),              // batch near-dup of A
      (120L, "two words"),               // shingle-less (corpus twin below)
      (130L, null.asInstanceOf[String]),
      (140L, "completely different content about spark catalyst plan rules"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, a), (3L, a), (5L, a),         // corpus members of group A
      (2L, b), (4L, b), (6L, b),         // all-corpus group B
      (20L, "two words"),
      (30L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val ref = pairs(newDocs, corpus, direct)
    val got = pairs(newDocs, corpus, collapsedForced)
    assert(got == ref)
    // sanity: batch-batch and batch-corpus dup pairs present at 1.0,
    // corpus-corpus absent, group B emits nothing (no new member
    // bands near it), shingle-less/null emit nothing
    assert(ref.contains((101L, 103L, 16)) && ref.contains((1L, 101L, 16)))
    assert(!ref.exists(p => p._1 == 1L && p._2 == 3L))
    assert(!ref.exists(p => Seq(2L, 4L, 6L, 20L, 30L, 120L, 130L).exists(
      i => p._1 == i || p._2 == i)))

    // real data equivalence: the registered sf0.001 batch/corpus split
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rNew = real.filter(col("doc_id") % 5 === 0)
    val rOld = real.filter(col("doc_id") % 5 =!= 0)
    assert(pairs(rNew, rOld, collapsedForced) == pairs(rNew, rOld, direct))

    // threshold boundary via the rep_id plan discriminator, over the
    // batch ∪ corpus duplicate mass
    val copies = (0L until 200L)
      .map(i => (i, s"copied text number ${i % 20} repeated quite enough times"))
      .toDF("doc_id", "text")
    val cNew = copies.filter(col("doc_id") % 5 === 0)
    val cOld = copies.filter(col("doc_id") % 5 =!= 0)
    val f = Dedup.duplicateMassFraction(copies, "text")
    def usesCollapse(df: DataFrame): Boolean =
      df.queryExecution.analyzed.toString.contains("rep_id")
    val atGate =
      Dedup.incrementalMinHashCandidatesCollapsed(cNew, cOld, dupGate = f)
    val belowGate =
      Dedup.incrementalMinHashCandidatesCollapsed(cNew, cOld, dupGate = f - 1e-9)
    assert(!usesCollapse(atGate) && usesCollapse(belowGate))
    def ps(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ps(atGate) == ps(belowGate))
    // empty batch and empty corpus, both routes
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    for (gate <- Seq(-1.0, 2.0)) {
      assert(Dedup.incrementalMinHashCandidatesCollapsed(
        empty, copies, dupGate = gate).count() == 0)
      assert(Dedup.incrementalMinHashCandidatesCollapsed(
        cNew, empty, dupGate = gate).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Dedup.incrementalMinHashCandidates(cNew, empty).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
  }

  test("registered minhash rows route the collapse on a dup-heavy corpus via the fused probe") {
    // r19: the registered rows decide the route from ONE fused
    // aggregate (gate fraction + sort bounds) and pin it through
    // endpoint gates — on a duplicate-heavy corpus they must take the
    // collapse and still equal the direct computation row-for-row
    val dir = java.nio.file.Files.createTempDirectory("graft-duproute").toString
    (0L until 300L).map(i =>
      (i, s"same text repeated over and over number ${i % 15} indeed"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val lsh = graft.SparkEntry.queries("minhash_lsh_pairs")(spark, dir)
    assert(lsh.queryExecution.analyzed.toString.contains("rep_id"),
      "dup-heavy corpus must route the collapse")
    assert(rows(lsh) ==
      rows(Dedup.minHashCandidates(docs).orderBy(col("id_a"), col("id_b"))))
    graft.core.OpCaches.release()
    val inc = graft.SparkEntry.queries("minhash_incremental_pairs")(spark, dir)
    assert(inc.queryExecution.analyzed.toString.contains("rep_id"))
    assert(rows(inc) ==
      rows(Dedup.incrementalMinHashCandidates(
        docs.filter(col("doc_id") % 5 === 0),
        docs.filter(col("doc_id") % 5 =!= 0))
        .orderBy(col("id_a"), col("id_b"))))
    graft.core.OpCaches.release()
  }

  test("registered pair queries: probed-bounds sort equals the sampling orderBy") {
    // the registered simhash_pairs / minhash_lsh_pairs ride
    // StaticRange.denseIdSort keyed on id_a with bounds probed from
    // the docs table — (id_a, id_b) pairs are distinct, so the total
    // order is unique and the rows must be IDENTICAL, in order, to
    // the sampling orderBy the oracle mirrors
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("simhash_pairs", "minhash_lsh_pairs")) {
      val got = graft.SparkEntry.queries(name)(spark, dir)
        .collect().map(_.toSeq).toSeq
      graft.core.OpCaches.release()
      val sorted = (name match {
        case "simhash_pairs" =>
          Dedup.simHashPairsCollapsed(graft.Tables.documents(spark, dir),
            maxHamming = 3,
            signature = graft.functions.HashFunctions.simhash_md5)
        case _ =>
          Dedup.minHashCandidatesCollapsed(graft.Tables.documents(spark, dir))
      }).orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
      assert(got == sorted, s"$name: probed-bounds order diverges")
      graft.core.OpCaches.release()
    }
  }

  test("collapse forms on empty and all-null corpora") {
    import graft.functions.HashFunctions.simhash_md5
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val nulls = Seq((1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    // pin BOTH gate routes (forced collapse and forced direct) plus
    // the default gate (whose probe must handle zero non-null rows)
    for (gate <- Seq(-1.0, Dedup.DefaultDupGate, 2.0)) {
      assert(Dedup.simHashPairsCollapsed(
        empty, "text", "doc_id", 3, simhash_md5, gate).count() == 0)
      assert(Dedup.simHashPairsCollapsed(
        nulls, "text", "doc_id", 3, simhash_md5, gate).count() == 0)
      assert(Dedup.minHashCandidatesCollapsed(empty, dupGate = gate)
        .count() == 0)
      assert(Dedup.minHashCandidatesCollapsed(nulls, dupGate = gate)
        .count() == 0)
      assert(Dedup.neardupComponents(empty, dupGate = gate).count() == 0)
      // null-text docs are singletons labeled by their own id
      assert(Dedup.neardupComponents(nulls, dupGate = gate)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        Set((1L, 1L), (2L, 2L)))
    }
  }

  test("duplicate-mass gate: fraction probe and threshold-boundary routing") {
    import graft.functions.HashFunctions.simhash_md5
    // fraction probe: all-distinct ~0 (clamped at 0 against HLL error),
    // 10-copy corpus ~0.9, nulls excluded from both terms
    val distinctDocs = (0L until 200L)
      .map(i => (i, s"unique text number $i with some words"))
      .toDF("doc_id", "text")
    val copies = (0L until 200L)
      .map(i => (i, s"copied text number ${i % 20} repeated enough"))
      .toDF("doc_id", "text")
    val fDistinct = Dedup.duplicateMassFraction(distinctDocs, "text")
    val fCopies = Dedup.duplicateMassFraction(copies, "text")
    assert(fDistinct < 0.05, s"all-distinct fraction $fDistinct")
    assert(fCopies > 0.8 && fCopies <= 0.95, s"10-copy fraction $fCopies")
    val withNulls = copies.unionByName(
      Seq((900L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    assert(math.abs(
      Dedup.duplicateMassFraction(withNulls, "text") - fCopies) < 1e-12,
      "null-text rows must not move the fraction")

    // threshold boundary: collapse iff fraction > gate (strict), pinned
    // AT the measured fraction (not >) and just below it. The probe is
    // deterministic (HLL++ is a pure function of the value set), so
    // using the measured fraction as the boundary is stable. Routing
    // observed via the plan: only the collapse paths alias "rep_id".
    def usesCollapse(df: DataFrame): Boolean =
      df.queryExecution.analyzed.toString.contains("rep_id")
    val atGate = Dedup.simHashPairsCollapsed(
      copies, "text", "doc_id", 3, simhash_md5, fCopies)
    val belowGate = Dedup.simHashPairsCollapsed(
      copies, "text", "doc_id", 3, simhash_md5, fCopies - 1e-9)
    assert(!usesCollapse(atGate), "fraction == gate must route direct")
    assert(usesCollapse(belowGate), "fraction > gate must route collapsed")
    // both routes produce identical pair sets
    def pairSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairSet(atGate) == pairSet(belowGate))

    // same boundary for neardupComponents
    val ndAt = Dedup.neardupComponents(copies, dupGate = fCopies)
    val ndBelow = Dedup.neardupComponents(copies, dupGate = fCopies - 1e-9)
    assert(!usesCollapse(ndAt) && usesCollapse(ndBelow))
    def labelSet(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labelSet(ndAt) == labelSet(ndBelow))

    // endpoint gates skip the probe and force the route
    assert(usesCollapse(Dedup.simHashPairsCollapsed(
      distinctDocs, "text", "doc_id", 3, simhash_md5, -1.0)))
    assert(!usesCollapse(Dedup.simHashPairsCollapsed(
      copies, "text", "doc_id", 3, simhash_md5, 1.0)))
  }

  test("neardupComponents tolerates a caller frame carrying a label column") {
    // regression: the direct (duplicate-light) route used to join the
    // RAW caller frame against the component frame and coalesce on
    // col("label") — ambiguous when docs itself has a `label` column
    // (a common name in labeling pipelines), and data-dependent: the
    // same frame with >gate duplicate mass took the collapsed path,
    // which projects before joining, and worked. Both routes must
    // ignore caller columns beyond (idCol, textCol).
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, a, 99L), (2L, a, 98L),
      (3L, "pack my box with five dozen liquor jugs now", 97L))
      .toDF("doc_id", "text", "label")
    def labels(gate: Double) =
      Dedup.neardupComponents(docs, dupGate = gate)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = labels(1.0)    // forced direct — the route that threw
    val collapsed = labels(-1.0)
    assert(direct == collapsed, s"$direct vs $collapsed")
    assert(direct == Set((1L, 1L), (2L, 1L), (3L, 3L)))
  }
}
