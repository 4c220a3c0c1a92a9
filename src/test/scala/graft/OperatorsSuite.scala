package graft

import org.apache.spark.sql.functions._

import graft.core.Skew
import graft.operators.{AsOf, Dedup}

class OperatorsSuite extends SparkSuite {
  import spark.implicits._

  test("topFraction keeps exactly ceil(f * n) best rows per stratum") {
    import graft.operators.Curation
    // strata of size 7 and 4: ceil(0.25 * 7) = 2, ceil(0.25 * 4) = 1
    val df = (Seq.tabulate(7)(i => (i.toLong, "a", i * 10.0)) ++
      Seq.tabulate(4)(i => (100L + i, "b", 5.0))) // all-tied scores
      .toDF("id", "grp", "score")
    val kept = Curation.topFraction(df, col("score"), Seq("grp"), "id", 0.25)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    // stratum a: two highest scores (ids 6, 5); stratum b: tie broken
    // by lowest id (100)
    assert(kept == Set(("a", 6L), ("a", 5L), ("b", 100L)), kept)
    assert(Curation.topFraction(df, col("score"), Seq("grp"), "id", 1.0)
      .count() == df.count())
    // original schema passes through untouched
    assert(Curation.topFraction(df, col("score"), Seq("grp"), "id", 0.5)
      .columns.toSeq == df.columns.toSeq)
    // the skew-safe bounded form returns exactly the same rows (incl.
    // the all-tied stratum, where the heap's id-asc tiebreak must
    // match the window's)
    for (f <- Seq(0.25, 0.5, 1.0)) {
      val win = Curation.topFraction(df, col("score"), Seq("grp"), "id", f)
        .collect().map(_.toSeq).toSet
      val bounded = Curation.topFractionBounded(df, col("score"), Seq("grp"), "id", f)
        .collect().map(_.toSeq).toSet
      assert(win == bounded, s"f=$f: $win != $bounded")
    }
  }

  test("topFractionBounded == topFraction on a skewed multi-stratum fixture") {
    import graft.operators.Curation
    // 5 strata with 100x size skew (the shape the bounded form
    // exists for), duplicate scores across and within strata, and a
    // fraction that exercises non-trivial ceil cuts per stratum
    val rnd = new scala.util.Random(7)
    val sizes = Seq("s0" -> 400, "s1" -> 37, "s2" -> 4, "s3" -> 1, "s4" -> 90)
    val rows = sizes.flatMap { case (g, n) =>
      Seq.tabulate(n)(i =>
        (g.hashCode.toLong * 1000 + i, g, rnd.nextInt(20).toDouble))
    }
    val df = rows.toDF("id", "grp", "score")
    for (f <- Seq(0.1, 0.25, 0.6)) {
      val win = Curation.topFraction(df, col("score"), Seq("grp"), "id", f)
        .collect().map(_.toSeq).toSet
      val bounded = Curation
        .topFractionBounded(df, col("score"), Seq("grp"), "id", f)
        .collect().map(_.toSeq).toSet
      assert(win == bounded,
        s"f=$f: ${(win -- bounded).take(3)} / ${(bounded -- win).take(3)}")
      // the narrow form reconstructs (strata, score, id) straight off
      // the heaps — same winners, no semi-join back to the frame
      val narrow = Curation.topFractionBoundedNarrow(
        df, col("score"), Seq("grp"), "id", f, scoreName = "score")
        .select(col("id"), col("grp"), col("score"))
        .collect().map(_.toSeq).toSet
      val winNarrow = Curation.topFraction(df, col("score"), Seq("grp"), "id", f)
        .select(col("id"), col("grp"), col("score"))
        .collect().map(_.toSeq).toSet
      assert(narrow == winNarrow,
        s"f=$f narrow: ${(winNarrow -- narrow).take(3)} / ${(narrow -- winNarrow).take(3)}")
    }
    // ...and past the literal-strata bound it must route through the
    // joined fallback unchanged (300 strata > MaxLiteralStrata)
    val wide = (0 until 300).flatMap(g =>
      Seq((g * 10L, s"g$g", 1.0), (g * 10L + 1, s"g$g", 2.0)))
      .toDF("id", "grp", "score")
    val nw = Curation.topFractionBoundedNarrow(
      wide, col("score"), Seq("grp"), "id", 0.5, scoreName = "score")
      .collect().map(_.toSeq).toSet
    val ww = Curation.topFraction(wide, col("score"), Seq("grp"), "id", 0.5)
      .select(col("grp"), col("score"), col("id"))
      .collect().map(_.toSeq).toSet
    assert(nw == ww, s"${(ww -- nw).take(3)} / ${(nw -- ww).take(3)}")
  }

  test("topFractionBounded forms return empty on an EMPTY input, same schema") {
    // regression: max(__k) over zero strata is NULL and the driver
    // read threw ROW_VALUE_IS_NULL — hit for real when the 100x
    // replica corpus left the curation pipeline's decontaminated
    // frame empty (every text had a copy in the benchmark slice)
    import graft.operators.Curation
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "grp", "score")
      .filter(col("score") > 0) // a non-trivially-empty plan, like the pipeline
    val bounded = Curation.topFractionBounded(
      empty, col("score"), Seq("grp"), "id", 0.5)
    assert(bounded.count() == 0)
    assert(bounded.columns.toSeq == Seq("id", "grp", "score"))
    val narrow = Curation.topFractionBoundedNarrow(
      empty, col("score"), Seq("grp"), "id", 0.5, scoreName = "score")
    assert(narrow.count() == 0)
    assert(narrow.columns.toSeq == Seq("grp", "score", "id"))
  }

  test("planted embedding near-dups: default ivf knobs hit recall >= 0.9, exact precision") {
    import graft.operators.Similarity
    // 500 random 32-dim vectors + 60 planted near-dups (base + small
    // noise): known truth at cosine >= 0.9, seeded
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(32)(rnd.nextGaussian().toFloat)
    val base = Seq.tabulate(500)(i => (i.toLong, vec().toSeq))
    val planted = (0 until 60).map { j =>
      val (bid, v) = base(rnd.nextInt(base.length))
      (1000L + j, v.map(x => x + (rnd.nextGaussian() * 0.05).toFloat))
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val got = Similarity.ivfNearDupPairs(corpus, threshold = 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact truth by brute force on the quantized vectors
    val p = Similarity.prepared(corpus, "embedding", "vec_id")
    val truth = p.select(col("vec_id").as("id_a"), col("v").as("va"), col("n2").as("na2"))
      .join(p.select(col("vec_id").as("id_b"), col("v").as("vb"), col("n2").as("nb2")))
      .filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosineQ(Similarity.dotQ(col("va"), col("vb")),
        col("na2"), col("nb2")) >= 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 55, s"planting failed: ${truth.size}")
    // blocking misses only lose recall; the exact verify means NO
    // false positives ever
    assert(got.subsetOf(truth), (got -- truth).take(3))
    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.9, s"ivf near-dup recall $recall")
  }

  test("deterministic sampling: reproducible, salt-independent draws, exact strata") {
    import graft.operators.Sampling
    val df = (0L until 400L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
    val a = Sampling.bernoulliSample(df, "id", 0.25).collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulliSample(df, "id", 0.25).collect().map(_.getLong(0)).toSet
    assert(a == b) // same salt -> identical sample
    // roughly fraction-sized (48-bit uniform; 400 draws, loose bound)
    assert(a.size > 60 && a.size < 140, a.size)
    val c = Sampling.bernoulliSample(df, "id", 0.25, salt = "other")
      .collect().map(_.getLong(0)).toSet
    assert(a != c) // independent draw under a different salt
    // growing the fraction only ADDS rows (nested samples — the
    // property hash-thresholding guarantees and rand() cannot)
    val wider = Sampling.bernoulliSample(df, "id", 0.5).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider))

    val s = Sampling.stratifiedSample(df, Seq("lang"), "id", 10)
    val got = s.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.length == 30) // 10 per stratum, 3 strata
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to 10)) }
    // equals the window formulation exactly (aggregate path == rank path)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"))
      .orderBy(Sampling.hash48(col("id"), "graft"), col("id"))
    val viaWindow = df.withColumn("smp_rank", row_number().over(w).cast("int"))
      .filter(col("smp_rank") <= 10)
      .select(col("lang"), col("id"), col("smp_rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.toSet == viaWindow)
    // row form: left-semi keeps full rows for exactly the sampled ids
    val rows = Sampling.stratifiedSampleRows(df, Seq("lang"), "id", 10)
    assert(rows.collect().map(_.getLong(0)).toSet == got.map(_._2).toSet)
    assert(rows.columns.toSeq == df.columns.toSeq)
  }

  test("operator caches are tracked, deduped, and released via OpCaches") {
    import graft.core.OpCaches
    OpCaches.release()
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.minHashCandidates(docs).count()
    val afterFirst = OpCaches.trackedCount
    assert(afterFirst >= 1)
    // a second call over the SAME plan re-tracks without re-persisting
    // (no "already cached" warning, no second block): storageLevel is
    // a plan-level lookup, so the count stays flat
    graft.operators.Dedup.minHashCandidates(docs).count()
    assert(OpCaches.trackedCount == afterFirst)
    OpCaches.release()
    assert(OpCaches.trackedCount == 0)
    // after release the plan is uncached again
    val sig = graft.operators.Dedup
      .minHashSignatures(docs, "text", "doc_id", 3, 16)
    assert(sig.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("asofJoinBackward picks the latest right row at or before left time") {
    val left = Seq((1L, 100L, "o1"), (1L, 250L, "o2"), (2L, 50L, "o3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 300L, 30.0),
      (2L, 60L, 40.0)).toDF("k", "rt", "v")
    val got = AsOf.asofJoinBackward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t").collect()
    // (1, 100) matches rt=100 inclusively; (1, 250) -> rt=200;
    // (2, 50) precedes every right row -> null
    assert(got.map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)))).toSeq == Seq(
      (1L, 100L, Some(10.0)), (1L, 250L, Some(20.0)), (2L, 50L, None)))
  }

  test("asofJoinForward picks the earliest right row at or after left time") {
    val left = Seq((1L, 100L, "o1"), (1L, 250L, "o2"), (2L, 70L, "o3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 300L, 30.0),
      (2L, 60L, 40.0)).toDF("k", "rt", "v")
    val got = AsOf.asofJoinForward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t").collect()
    // (1, 100) matches rt=100 inclusively; (1, 250) -> rt=300;
    // (2, 70) is after every right row -> null
    assert(got.map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)))).toSeq == Seq(
      (1L, 100L, Some(10.0)), (1L, 250L, Some(30.0)), (2L, 70L, None)))
  }

  test("asofJoinBackward keeps NULL value columns from the matched row (no frankenrow)") {
    // right row at rt=200 carries v=NULL: the left row at t=250 must
    // take (NULL, "b") from THAT row — not back-fill v=10.0 from rt=100
    val left = Seq((1L, 250L, "o")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 100L, Option(10.0), "a"),
      (1L, 200L, Option.empty[Double], "b"))
      .toDF("k", "rt", "v", "w")
    val got = AsOf.asofJoinBackward(left, right, Seq("k"), "t", "rt", Seq("v", "w"))
      .select("v", "w").collect()
    assert(got.length == 1)
    assert(got(0).isNullAt(0), s"v must be NULL (matched row's value), got ${got(0)}")
    assert(got(0).getString(1) == "b")
  }

  test("asofJoinBackward rejects colliding value names") {
    val l = Seq((1L, 1L)).toDF("k", "t")
    val r = Seq((1L, 1L)).toDF("k", "t")
    intercept[IllegalArgumentException](
      AsOf.asofJoinBackward(l, r, Seq("k"), "t", "t", Seq("t")))
  }

  test("saltedJoin equals the plain join on skewed data") {
    // hot key: 900 of 1000 rows share key 7
    val large = spark.range(1000)
      .select(when($"id" < 900, 7L).otherwise($"id").as("k"), $"id".as("payload"))
    val small = Seq((7L, "hot"), (950L, "cold")).toDF("k", "tag")
    val plain = large.join(small, Seq("k")).orderBy("payload")
      .collect().toSeq
    val salted = Skew.saltedJoin(large, small, Seq("k"), 8).orderBy("payload")
      .select("k", "payload", "tag").collect().toSeq
    assert(salted == plain)
    assert(salted.size == 901)
  }

  test("saltedSumCount equals the direct aggregation") {
    val df = spark.range(1000)
      .select(when($"id" < 900, 7L).otherwise($"id" % 10).as("k"),
        ($"id" % 13).cast("double").as("v"))
    val direct = df.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("cnt"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", 8)
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }

  test("MLlib MinHashLSH variant finds the same near-dup, deterministically") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      0L -> base,
      1L -> (base + " tomorrow"),
      2L -> "completely different words appear in this unrelated document text")
      .toDF("doc_id", "text")
    val got = graft.operators.DedupMl.minHashCandidatesMl(docs, maxDistance = 0.6)
      .collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), s"expected (0,1) in $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    // deterministic across invocations (fixed seed)
    val again = graft.operators.DedupMl.minHashCandidatesMl(docs, maxDistance = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == pairs)
  }

  test("mixtureSample hits target mixture proportions and is reproducible") {
    import graft.operators.Sampling
    // 1000 'a' rows, 200 'b' rows, 300 'c' rows; recipe wants a 50/50
    // a/b sample at 40% of the corpus (600 rows): a -> 300/1000,
    // b -> min(1, 300/200) = all 200 (upsample-by-omission saturates),
    // c -> dropped (absent from the recipe)
    val df = ((0 until 1000).map(i => (i.toLong, "a")) ++
      (1000 until 1200).map(i => (i.toLong, "b")) ++
      (1200 until 1500).map(i => (i.toLong, "c")))
      .toDF("id", "dom")
    val got = Sampling.mixtureSample(df, "dom", "id",
      Map("a" -> 0.5, "b" -> 0.5), totalFraction = 0.4)
    val byDom = got.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byDom.contains("c"), s"unlisted domain kept: $byDom")
    assert(byDom("b") == 200, s"saturated domain must keep all rows: $byDom")
    // hash-thresholded Bernoulli at 0.3: expect ~300 of 1000 (binomial
    // 3-sigma ~ 43)
    assert(math.abs(byDom("a") - 300L) < 60, s"a-domain off target: $byDom")
    // deterministic: same call, same rows
    val again = Sampling.mixtureSample(df, "dom", "id",
      Map("a" -> 0.5, "b" -> 0.5), totalFraction = 0.4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("id").collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException](
      Sampling.mixtureSample(df, "dom", "id", Map("a" -> 0.5), 0.0))
  }

  test("redactPii masks well-formed identifiers and leaves look-alikes alone") {
    import graft.operators.Curation
    val df = Seq(
      (0L, "mail bob.smith+x@sub.example.org now"),
      (1L, "server at 192.168.0.1 responded"),
      (2L, "call +1-555-123-4567 today"),
      (3L, "version 1.2.3 of pi 3.14 at rank 4"), // 3 dotted groups / floats: untouched
      (4L, "ticket 555-123-4567 plain"),          // no +CC prefix: untouched
      (5L, "a@b fragment"))                       // no TLD: untouched
      .toDF("id", "t")
      .select(col("id"), Curation.redactPii(col("t")).as("r"))
    val got = df.orderBy("id").collect().map(_.getString(1))
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "server at <IP> responded")
    assert(got(2) == "call <PHONE> today")
    assert(got(3) == "version 1.2.3 of pi 3.14 at rank 4")
    assert(got(4) == "ticket 555-123-4567 plain")
    assert(got(5) == "a@b fragment")
  }

  test("json_extract semantics pinned for non-scalar and missing keys") {
    // the registered query uses get_json_object (not a typed from_json
    // struct field): missing key -> null, but a NON-SCALAR value comes
    // back as the raw JSON text — and its int cast THROWS under ANSI
    // where the struct form would have nulled. Pin both so a testdata
    // refresh with nested props fails visibly, not silently.
    val df = Seq(
      (0L, """{"k": "7"}"""),
      (1L, """{"k": {"a": 1}}"""),
      (2L, """{"x": 1}"""))
      .toDF("event_id", "props")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"))
    val rows = df.orderBy("event_id").collect()
    assert(rows(0).getString(1) == "7")
    assert(rows(1).getString(1).replaceAll("\\s", "") == """{"a":1}""",
      s"non-scalar k should surface as raw JSON text, got ${rows(1).getString(1)}")
    assert(rows(2).isNullAt(1))
    val ansiKey = "spark.sql.ansi.enabled"
    val orig = spark.conf.get(ansiKey)
    try {
      spark.conf.set(ansiKey, "true")
      // scalar rows cast cleanly (the oracle-matched path)
      val ok = df.filter(col("event_id") === 0)
        .select(col("k_str").cast("int")).collect()
      assert(ok.head.getInt(0) == 7)
      // the raw JSON text of a nested value is not int-castable
      intercept[Exception] {
        df.filter(col("event_id") === 1)
          .select(col("k_str").cast("int")).collect()
      }
    } finally spark.conf.set(ansiKey, orig)
  }

  test("ngramJaccardPairs maxDocFreq drops hot shingles consistently") {
    // "x y z" appears in all three docs (df=3); the cap at 2 removes it
    val docs = Seq(
      (0L, "x y z a b c"), (1L, "x y z a b d"), (2L, "x y z q r s"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(docs, minJaccard = 0.0)
      .orderBy("id_a", "id_b").collect()
    val capped = Dedup.ngramJaccardPairs(docs, minJaccard = 0.0, maxDocFreq = Some(2))
      .orderBy("id_a", "id_b").collect()
    // uncapped: docs 0,2 share only "x y z" -> pair exists
    assert(uncapped.exists(r => r.getLong(0) == 0L && r.getLong(1) == 2L))
    // capped: that shingle is gone -> pair (0,2) disappears,
    // (0,1) survives on the discriminative shingles
    assert(!capped.exists(r => r.getLong(0) == 0L && r.getLong(1) == 2L))
    assert(capped.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
  }

  test("chunkByTokens covers every token with the exact stride grid") {
    import graft.operators.Chunking
    val words = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (0L, words),        // 10 tokens
      (1L, "a b c"),      // 3 tokens -> one chunk
      (2L, "   "),        // blank -> dropped
      (3L, "solo"),       // 1 token -> one chunk
      (4L, "\tlead tab\n")) // edge tab/newline -> tokens kept intact
      .toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(df, window = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // doc 0: starts 0,3,6 — ceil((10-4)/3)=2 -> last start 6 covers
    // tokens 7..10; every token appears in >= 1 chunk
    assert(got.toSeq == Seq(
      (0L, 0, 4, "w1 w2 w3 w4"),
      (0L, 1, 4, "w4 w5 w6 w7"),
      (0L, 2, 4, "w7 w8 w9 w10"),
      (1L, 0, 3, "a b c"),
      (3L, 0, 1, "solo"),
      (4L, 0, 2, "lead tab")), got.mkString("\n"))
    intercept[IllegalArgumentException](
      Chunking.chunkByTokens(df, window = 4, stride = 5))
  }

  test("chunkByTokens adjacent chunks share window - stride tokens") {
    import graft.operators.Chunking
    val df = Seq((0L, (1 to 100).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Chunking.chunkByTokens(df, window = 32, stride = 24)
      .orderBy("chunk_id").collect()
      .map(_.getString(3).split(" ").toSeq)
    assert(chunks.length == 4) // starts 0, 24, 48, 72
    chunks.sliding(2).foreach { pair =>
      val (a, b) = (pair(0), pair(1))
      assert(a.takeRight(8) == b.take(8), "8-token overlap broken")
    }
    assert(chunks.last.size == 28) // 100 - 72: short tail kept
  }

  test("winnowFingerprints guarantees shared fps for long shared passages") {
    import graft.operators.Fingerprint
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (0L, s"aa bb cc $shared"),
      (1L, s"$shared xx yy zz"),
      (2L, "totally different words here entirely now"),
      (3L, "ab"), // < k tokens -> dropped
      (4L, "one two three")) // exactly one shingle -> one fp
      .toDF("doc_id", "text")
    val fps = Fingerprint.winnowFingerprints(df, k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // winnowing guarantee: a copied passage of >= w + k - 1 = 6
    // tokens shares at least one fingerprint
    assert((fps(0L) & fps(1L)).nonEmpty, "shared 20-token passage missed")
    assert((fps(0L) & fps(2L)).isEmpty, "disjoint docs must not collide")
    assert(!fps.contains(3L), "sub-shingle doc must drop")
    assert(fps(4L).size == 1, "single-shingle doc keeps its one fp")
    // density: ~2/(w+1) of shingles, never more than shingle count
    assert(fps(0L).size <= 21 && fps(0L).size >= 2)
  }

  test("winnowFingerprints is position-robust: prefix shift keeps passage fps") {
    import graft.operators.Fingerprint
    val passage = (1 to 12).map(i => s"p$i").mkString(" ")
    val df = Seq((0L, passage), (1L, s"pre1 pre2 pre3 pre4 pre5 $passage"))
      .toDF("doc_id", "text")
    val fps = Fingerprint.winnowFingerprints(df, k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(0L) & fps(1L)).nonEmpty,
      "fingerprints must be content-addressed, not offset-addressed")
  }

  test("hashSplit assigns every row deterministically with stable proportions") {
    import graft.operators.Sampling
    val df = (0L until 2000L).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.hashSplit(df, "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 2000, "every row assigned exactly once")
    val counts = got.values.groupBy(identity).view.mapValues(_.size).toMap
    // binomial 4-sigma bounds on 2000 rows
    assert(math.abs(counts("train") - 1600) < 72, counts.toString)
    assert(math.abs(counts("val") - 200) < 54, counts.toString)
    assert(math.abs(counts("test") - 200) < 54, counts.toString)
    // growth stability: adding rows never reassigns existing ones
    val grown = Sampling.hashSplit((0L until 4000L).toDF("id"), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall { case (id, s) => grown(id) == s })
    intercept[IllegalArgumentException](
      Sampling.hashSplit(df, "id", Seq("a" -> 0.5)))
  }

  test("semantic dedup keeps the min-id vector per embedding cluster") {
    val q = SparkEntry.queries("semantic_dedup")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(q.nonEmpty)
    // exactly one survivor per component, and it is the min id
    q.groupBy(_._2).foreach { case (comp, members) =>
      val survivors = members.filter(_._3 == 1).map(_._1)
      assert(survivors.toSeq == Seq(members.map(_._1).min),
        s"component $comp: $members")
    }
    // every vector appears exactly once
    assert(q.map(_._1).distinct.length == q.length)
  }

  test("gopherGate applies the five rules on exact-integer thresholds") {
    import graft.operators.Curation
    val ok = (1 to 60).map(i => s"word$i").mkString(" ") // 60 tokens, mean len ~6
    val df = Seq(
      (0L, ok),                                        // passes all
      (1L, "too short"),                               // fails token floor
      (2L, (1 to 60).map(_ => "a").mkString(" ")),     // mean word len 1 < 3
      (3L, ok + " " + ok),                             // dup 5-grams dominate
      (4L, (1 to 40).map(_ => "ha ho").mkString(" "))) // dominant 2-gram
      .toDF("doc_id", "text")
    val got = Curation.gopherGate(df, minTokens = 50)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 1, 1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0), got)
  }

  test("winnow kernel equals the declarative HOF reference on edge inputs") {
    import graft.operators.Fingerprint
    // adversarial shapes: multi-space runs, edge tabs/newlines (NOT
    // dropped — tokensNonEmpty removes the phantom empty edge token
    // btrim's space-only trim would leave), exactly-k tokens,
    // repeated shingles, blank/whitespace-only
    val df = Seq(
      (0L, "a b c d e f g"),
      (1L, "a  b\tc   d"),      // internal tabs/multi-space
      (2L, "\ta b c d\n"),      // edge tab/newline -> same as "a b c d"
      (3L, "x y z"),            // exactly k tokens
      (4L, "r r r r r r r r"),  // all-equal shingles -> one fp
      (5L, "  padded   with spaces   "),
      (6L, ""), (7L, "   "), (8L, "one two"),
      (9L, "a b c d"))          // clean twin of doc 2
      .toDF("doc_id", "text")
    val kernel = Fingerprint.winnowFingerprints(df, k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val declarative = Fingerprint.winnowFingerprintsDeclarative(df, k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(kernel == declarative,
      s"kernel:\n  ${kernel.mkString("\n  ")}\ndecl:\n  ${declarative.mkString("\n  ")}")
    val byDoc = kernel.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(2L) == byDoc(9L),
      "edge whitespace must not change the fingerprint set")
    assert(byDoc(4L).size == 1, "all-equal shingles collapse to one fp")
    assert(byDoc.contains(3L), "exactly-k doc keeps one fp")
    assert(!byDoc.contains(6L) && !byDoc.contains(7L) && !byDoc.contains(8L))
  }

  test("winnowPairs finds passage-sharing docs and df-caps boilerplate") {
    import graft.operators.Fingerprint
    val passage = (1 to 30).map(i => s"p$i").mkString(" ")
    val boiler = "standard header line common to all docs"
    val df = Seq(
      (0L, s"$boiler $passage"),
      (1L, s"$boiler intro words then $passage"),
      (2L, s"$boiler completely different content in this one entirely"),
      (3L, s"$boiler nothing shared here either beyond the header"),
      (4L, s"$boiler another unrelated document body text"),
      (5L, s"$boiler and one more to push header df past the cap"))
      .toDF("doc_id", "text")
    val pairs = Fingerprint.winnowPairs(df, k = 3, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the 30-token shared passage yields >= 2 shared fps for (0,1)
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L), pairs.mkString(","))
    // the boilerplate header appears in 6 docs > cap 5, so header-only
    // doc pairs (e.g. 2-3) never reach minShared
    assert(!pairs.exists(p => p._1 == 2L && p._2 == 3L), pairs.mkString(","))
  }

  test("knnClassify takes the modal neighbor label with deterministic ties") {
    import graft.operators.Similarity
    // 2-d embeddings: cluster A around (1,0) labeled 1, cluster B
    // around (0,1) labeled 2; query 100 sits in cluster A
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.9f, 0.1f), 1),
      (2L, Array(0.95f, 0.05f), 1),
      (3L, Array(0.0f, 1.0f), 2),
      (4L, Array(0.1f, 0.9f), 2),
      (100L, Array(0.92f, 0.08f), 9))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(
      corpus, corpus.filter(col("vec_id") === 100L), 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // 3 nearest to query 100 are the A cluster (self excluded) ->
    // label 1 with 3 votes
    assert(got.toSeq == Seq((100L, 1, 3L)), got.mkString(","))
    // k spanning both clusters: 5 neighbors = 3x label 1 + 2x label 2
    val got5 = Similarity.knnClassify(
      corpus, corpus.filter(col("vec_id") === 100L), 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got5.toSeq == Seq((100L, 1, 3L)), got5.mkString(","))
  }

  test("tfidfTopTerms ranks rare terms above common ones") {
    import graft.operators.Retrieval
    val df = Seq(
      (0L, "common common rare0 common"),
      (1L, "common rare1 rare1"),
      (2L, "common other2")).toDF("doc_id", "text")
    val got = Retrieval.tfidfTopTerms(df, topK = 2)
      .orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    // doc 0: rare0 (1 * 3/1 = 3) beats common (3 * 3/3 = 3) — tie
    // broken by term asc? No: scores tie at 3.0, 'common' < 'rare0'
    val doc0 = got.filter(_._1 == 0L)
    assert(doc0.map(_._3).toSeq == Seq("common", "rare0"), doc0.mkString(","))
    assert(doc0.head._5 == 3.0 && doc0(1)._5 == 3.0)
    // doc 1: rare1 tf=2 -> 2 * 3/1 = 6 beats common 1 * 3/3 = 1
    val doc1 = got.filter(_._1 == 1L)
    assert(doc1.map(_._3).toSeq == Seq("rare1", "common"))
    assert(doc1.head._5 == 6.0)
    // every doc contributes at most topK rows
    assert(got.groupBy(_._1).forall(_._2.length <= 2))
  }

  test("curation funnel golden: the full gate-to-pack composition pins its stage counts") {
    // every stage is deterministic (content hashes, exact rank cuts,
    // integer cumsums), so the funnel counts on the fixed sf0.001
    // corpus are a golden pin of the operators COMPOSED — a change
    // in any stage's semantics (gate rules, tie order, hash salt,
    // budget arithmetic) moves a count and fails here even if the
    // stage's own unit test still passes
    val out = java.nio.file.Files.createTempDirectory("graft-funnel")
    val counts = graft.examples.CurationDemo
      .funnel(spark, sf("sf0.001"), out.resolve("o").toString).toMap
    assert(counts == Map(
      "in" -> 500L, "gated" -> 420L, "exact_dedup" -> 420L,
      "near_dedup" -> 382L, "decontaminated" -> 376L, "quality" -> 284L,
      "mixed" -> 105L, "sampled" -> 105L, "tokens" -> 9177L, "oov" -> 0L,
      "chunks" -> 399L, "bins" -> 181L), counts)
  }

  test("vocab build + encode: rank by (freq desc, term), OOV -> 0, positions exact") {
    import graft.operators.Vocab
    val docs = Seq(
      (0L, "b a a c  a"),   // double space: empty tokens filtered
      (1L, "b b rare c"),
      (2L, " c a b ")).toDF("doc_id", "text")
    // freqs: a=4, b=4, c=3, rare=1 -> vocab(3): a=1, b=2, c=3
    val vocab = Vocab.buildVocab(docs, 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(vocab.toSeq == Seq((1, "a", 4L), (2, "b", 4L), (3, "c", 3L)), vocab.mkString(","))
    val enc = Vocab.vocabEncode(docs, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(enc.filter(_._1 == 0L).map(_._3).toSeq == Seq(2, 1, 1, 3, 1))
    // OOV encodes as 0 at its exact position
    assert(enc.filter(_._1 == 1L).map(_._3).toSeq == Seq(2, 2, 0, 3))
    assert(enc.filter(_._1 == 2L).map(_._3).toSeq == Seq(3, 1, 2))
    // positions are 0-based contiguous per doc
    enc.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.sortBy(_._2).map(_._2).toSeq == rs.indices)
    }
  }

  test("ivfNearDupBatch: batch probes corpus only, finds planted cross dups exactly") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(23)
    def vec(): Array[Float] = Array.fill(32)(rnd.nextGaussian().toFloat)
    val corpusRows = Seq.tabulate(400)(i => (100L + i, vec().toSeq))
    // batch: 20 noisy copies of corpus vectors + 20 fresh randoms
    val dups = (0 until 20).map { j =>
      val (_, v) = corpusRows(rnd.nextInt(corpusRows.length))
      (j.toLong, v.map(x => x + (rnd.nextGaussian() * 0.05).toFloat))
    }
    val fresh = (20 until 40).map(j => (j.toLong, vec().toSeq))
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val batch = (dups ++ fresh).toDF("vec_id", "embedding")
    val got = Similarity.ivfNearDupBatch(corpus, batch, threshold = 0.9,
      assignments = 24, minSharedCells = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every reported pair is batch x corpus by id range and above
    // threshold with the exact cosine
    assert(got.forall { case (b, c, cos) => b < 100 && c >= 100 && cos >= 0.9 })
    // exact truth by brute force
    val bp = Similarity.prepared(batch, "embedding", "vec_id")
    val cp = Similarity.prepared(corpus, "embedding", "vec_id")
    val truth = bp.select(col("vec_id").as("b"), col("v").as("va"), col("n2").as("na2"))
      .join(cp.select(col("vec_id").as("c"), col("v").as("vb"), col("n2").as("nb2")))
      .filter(Similarity.cosineQ(Similarity.dotQ(col("va"), col("vb")),
        col("na2"), col("nb2")) >= 0.9)
      .select("b", "c").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.size >= 18, s"planting failed: ${truth.size}")
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    assert(gotPairs.subsetOf(truth), (gotPairs -- truth).take(3))
    val recall = truth.count(gotPairs.contains).toDouble / truth.size
    assert(recall >= 0.9, s"incremental near-dup recall $recall")
  }

  test("resampleOhlc: open/close by (ts, id) total order, exact bars, partition-invariant") {
    import graft.operators.TimeSeries
    val ns = 1000000000L // 1 s buckets for the test grid
    val rows = Seq(
      // bucket 0 of type a: same-ts tie at t=5 -> id breaks open
      (0L, 5L, "a", 3.10), (1L, 5L, "a", 1.20), (2L, 900000000L, "a", 9.99),
      // bucket 1 of type a: single row (open=high=low=close)
      (3L, 1500000000L, "a", 2.00),
      // type b straddles the bucket edge: t=999999999 vs t=1000000000
      (4L, 999999999L, "b", 7.00), (5L, 1000000000L, "b", 4.00))
      .toDF("event_id", "ts", "event_type", "value")
    val got = TimeSeries.resampleOhlc(rows, ns, Seq("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getDouble(7)))
    assert(got.toSeq == Seq(
      // a/bucket0: open = id-0 value 3.10 (tie at t=5 broken by id),
      // high 9.99, low 1.20, close = t=0.9s row
      ("a", 0L, 3.10, 9.99, 1.20, 9.99, 3L, 14.29),
      ("a", 1L, 2.00, 2.00, 2.00, 2.00, 1L, 2.00),
      ("b", 0L, 7.00, 7.00, 7.00, 7.00, 1L, 7.00),
      ("b", 1L, 4.00, 4.00, 4.00, 4.00, 1L, 4.00)), got.mkString(","))
    // bit-identical at another parallelism (struct min/max + exact
    // cents are order-independent)
    val re = TimeSeries.resampleOhlc(rows.repartition(5), ns, Seq("event_type"))
      .collect().map(_.toSeq.toList).toList
    assert(re == got.map(t =>
      List[Any](t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8)).toList)
    // pre-epoch timestamps FLOOR to their true bucket (pmod, not %):
    // t=-0.5s belongs to bucket [-1s, 0s), labeled -1
    val neg = Seq((0L, -500000000L, "a", 1.00), (1L, 500000000L, "a", 2.00))
      .toDF("event_id", "ts", "event_type", "value")
    val negOut = TimeSeries.resampleOhlc(neg, ns, Seq("event_type"))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(negOut.toSeq == Seq((-1L, 1.00), (0L, 2.00)), negOut.mkString(","))
    // a sub-second grid would alias distinct buckets onto one epoch-
    // second label — rejected loudly
    intercept[IllegalArgumentException] {
      TimeSeries.resampleOhlc(rows, 500000000L, Seq("event_type"))
    }
  }

  test("knnJoin: neighbors are a high-recall exact-cosine subset of brute-force kNN") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(32)(rnd.nextGaussian().toFloat)
    val base = Seq.tabulate(300)(i => (i.toLong, vec().toSeq))
    val planted = (0 until 40).map { j =>
      val (_, v) = base(rnd.nextInt(base.length))
      (1000L + j, v.map(x => x + (rnd.nextGaussian() * 0.05).toFloat))
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding")
    val k = 3
    val got = Similarity.knnJoin(corpus, k, assignments = 24, minSharedCells = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // ranks are 1..k', contiguous, cosine non-increasing per vector
    got.groupBy(_._1).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length), s"ranks for $id")
      assert(sorted.length <= k)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      }, s"cosine order for $id")
    }
    // every reported cosine is the exact brute-force value, and each
    // planted near-dup's TRUE nearest neighbor is found (planted
    // pairs share cells with near-certainty)
    val p = Similarity.prepared(corpus, "embedding", "vec_id")
    val brute = p.select(col("vec_id").as("qa"), col("v").as("va"), col("n2").as("na2"))
      .join(p.select(col("vec_id").as("qb"), col("v").as("vb"), col("n2").as("nb2")))
      .filter(col("qa") =!= col("qb"))
      .select(col("qa"), col("qb"),
        Similarity.cosineQ(Similarity.dotQ(col("va"), col("vb")),
          col("na2"), col("nb2")).as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    got.foreach { case (a, b, c, _) =>
      assert(brute((a, b)) == c, s"cosine mismatch for ($a,$b)")
    }
    val top1 = brute.groupBy(_._1._1).map { case (q, m) =>
      q -> m.maxBy(e => (e._2, -e._1._2))._1._2
    }
    val gotTop = got.filter(_._4 == 1).map(r => r._1 -> r._2).toMap
    val plantedIds = planted.map(_._1)
    val hit = plantedIds.count(id => gotTop.get(id).contains(top1(id)))
    assert(hit >= plantedIds.length * 9 / 10,
      s"planted top-1 recall $hit/${plantedIds.length}")
  }

  test("groupCentroids: unit norms, singleton identity, zero-group zeros, partition-invariant") {
    import graft.operators.Embeddings
    val df = Seq(
      (0L, Array(3.0f, 4.0f, 0.0f), "a"),
      (1L, Array(3.0f, 4.0f, 0.0f), "a"), // duplicate: centroid = member direction
      (2L, Array(0.0f, 1.0f, 0.0f), "b"),
      (3L, Array(0.0f, 0.0f, 0.0f), "z")) // degenerate group
      .toDF("vec_id", "embedding", "grp")
    val out = Embeddings.groupCentroids(df, "grp")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    // group a: both members identical, so the centroid is the
    // normalized vector (3,4,0)/5 = (0.6, 0.8, 0)
    assert(out.filter(_._1 == "a").map(_._3).toSeq == Seq(0.6, 0.8, 0.0))
    // non-degenerate centroids have unit L2 norm
    for (g <- Seq("a", "b")) {
      val n2 = out.filter(_._1 == g).map(v => v._3 * v._3).sum
      assert(math.abs(n2 - 1.0) < 1e-12, s"group $g norm^2 $n2")
    }
    // all-zero group yields zeros, not NaN
    assert(out.filter(_._1 == "z").map(_._3).forall(_ == 0.0))
    // output is (grp, pos)-sorted and exactly |groups| x dim rows
    assert(out.toSeq == out.sortBy(r => (r._1, r._2)).toSeq)
    assert(out.length == 3 * 3)
    // bit-identical at a different parallelism (exact-integer sums)
    val re = Embeddings.groupCentroids(df.repartition(7), "grp")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(re.toSeq == out.toSeq)
  }

  test("SkewScan blocked lag/sessionize are bit-identical to the window forms") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.SkewScan
    // adversarial stream: one hot key spanning many blocks, ties in t
    // (ordered by id), events exactly ON block edges, empty-block
    // gaps, a key entirely inside one block, a singleton key.
    // blockSpan = 10 forces constant boundary crossings.
    val rows =
      // hot key 1: 200 events, steps of 3 (crosses every block), with
      // planted ties every 7th event and a long silent gap
      (0 until 200).map { i =>
        val t = if (i < 100) i * 3L else 5000L + (i - 100) * 3L
        (1L, 1000L + i, if (i % 7 == 0 && i > 0) t - 3L else t, i * 10L)
      } ++
      // key 2: all inside one block
      Seq((2L, 1L, 5L, 100L), (2L, 2L, 6L, 100L), (2L, 3L, 6L, 100L)) ++
      // key 3: exactly on block edges (t = 0, 10, 20)
      Seq((3L, 1L, 0L, 1L), (3L, 2L, 10L, 2L), (3L, 3L, 20L, 3L)) ++
      // key 4: singleton
      Seq((4L, 9L, 123L, 7L))
    val ev = rows.toDF("user_id", "event_id", "t", "vc")
      .repartition(7) // ensure a real shuffle, not a pre-sorted input

    // lag: blocked vs plain window
    val wRef = Window.partitionBy(col("user_id"))
      .orderBy(col("t").asc, col("event_id").asc)
    val refLag = ev.withColumn("prev", lag(col("t"), 1).over(wRef))
      .orderBy("user_id", "t", "event_id")
      .collect().map(_.toSeq).toSeq
    val gotLag = SkewScan.lagBlocked(ev, "user_id", "t", "event_id",
        "prev", blockSpan = 10L)
      .select("user_id", "event_id", "t", "vc", "prev")
      .orderBy("user_id", "t", "event_id")
      .collect().map(_.toSeq).toSeq
    assert(gotLag == refLag)

    // sessionize: blocked vs the sessionize_batch window form
    // (gap = 25 so the hot key's silent stretch splits sessions)
    def refSessions(gap: Long) = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      ev.withColumn("prev", lag(col("t"), 1).over(w))
        .withColumn("new_s",
          (col("prev").isNull || (col("t") - col("prev")) > gap).cast("int"))
        .withColumn("sidx", sum(col("new_s"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sidx"))
        .agg(min(col("t")).as("session_start_ms"),
          max(col("t")).as("session_end_ms"),
          count(lit(1)).cast("int").as("n_events"),
          (sum(col("vc")).cast("double") / 100).as("total_value"))
        .drop("sidx")
        .orderBy("user_id", "session_start_ms")
        .collect().map(_.toSeq).toSeq
    }
    for (gap <- Seq(3L, 25L, 1000000L)) {
      val got = SkewScan.sessionizeBlocked(ev, "user_id", "t",
          "event_id", "vc", gap, blockSpan = 10L)
        .orderBy("user_id", "session_start_ms")
        .collect().map(_.toSeq).toSeq
      assert(got == refSessions(gap), s"gap=$gap")
    }

    // hybrid routers: threshold 50 forces key 1 (200 rows) through the
    // blocked path and keys 2-4 through the window path, so the union
    // seam itself is under test; a huge threshold (pure window) and a
    // zero threshold (pure blocked) pin the degenerate routes too
    for (threshold <- Seq(0L, 50L, 1000000L)) {
      val gotLagH = SkewScan.lagSkewSafe(ev, "user_id", "t", "event_id",
          "prev", hotThreshold = threshold, blockSpan = 10L)
        .select("user_id", "event_id", "t", "vc", "prev")
        .orderBy("user_id", "t", "event_id")
        .collect().map(_.toSeq).toSeq
      assert(gotLagH == refLag, s"lagSkewSafe threshold=$threshold")
      val gotSesH = SkewScan.sessionizeSkewSafe(ev, "user_id", "t",
          "event_id", "vc", gap = 25L, hotThreshold = threshold,
          blockSpan = 10L)
        .orderBy("user_id", "session_start_ms")
        .collect().map(_.toSeq).toSeq
      assert(gotSesH == refSessions(25L), s"sessionizeSkewSafe threshold=$threshold")
    }

    // the hybrids consume their input three times (hot-key count,
    // left_anti, left_semi) — the r18 persist must show in the plan,
    // or an expensive upstream would be scanned thrice
    val hybridPlan = SkewScan.lagSkewSafe(ev, "user_id", "t", "event_id",
      "prev", hotThreshold = 50L, blockSpan = 10L)
      .queryExecution.executedPlan.toString
    assert(hybridPlan.contains("InMemoryTableScan"), hybridPlan.take(2000))
    graft.core.OpCaches.release()
  }
}
