package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Similarity}
import graft.streaming.EventsStream

class MultimodalStreamingSuite extends SparkSuite {
  import spark.implicits._

  test("multimodal: synthetic corpus has the contract schema") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val fields = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(fields("payload") == "binary")
    assert(fields("meta") == "struct")
    assert(media.count() == 30)
  }

  test("multimodal: feature extraction is deterministic, drops payload") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
    assert(f1.forall(_.feature.length == Multimodal.FeatureDim))
    assert(!Multimodal.extractFeatures(media).columns.contains("payload"))
  }

  test("multimodal: resize rewrites image metadata only") {
    val resized = Multimodal.resizeImages(Multimodal.syntheticMedia(spark, 9), 64, 64)
      .collect()
    assert(resized.filter(_.kind == "image").forall(r =>
      r.meta.width == 64 && r.meta.height == 64))
    assert(resized.filter(_.kind == "audio").forall(_.meta.width == 0))
  }

  test("multimodal: frame sampling explodes by duration/step") {
    val media = Multimodal.syntheticMedia(spark, 9)
    val frames = Multimodal.sampleFrames(media, everyMs = 500)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // video ids are 2,5,8 with durationMs = 2000 + id*100
    assert(counts(2L) == math.ceil(2200 / 500.0).toLong)
    assert(counts(5L) == math.ceil(2500 / 500.0).toLong)
    assert(counts(8L) == math.ceil(2800 / 500.0).toLong)
  }

  test("multimodal: perceptual near-dup finds planted byte-level dups, banded == all-pairs") {
    import graft.functions.HashFunctions.{hamming64, perceptual_hash64}
    // base payloads + one exact dup + one small byte mutation + one
    // unrelated payload: the mutated pair must surface at small
    // hamming, the banded result must EQUAL the all-pairs filter
    val base = (0L until 40L).map { i =>
      val body = Array.tabulate[Char](120)(j => ('a' + (i * 17 + j * 3) % 26).toChar)
      (i, new String(body))
    }
    val planted = base ++ Seq(
      (100L, base(7)._2),                       // exact dup of 7
      (101L, base(9)._2.updated(5, 'Z').updated(60, 'Q')), // near-dup of 9
      (102L, "zz"))                             // sub-gram payload -> sig 0
    val media = planted.toDF("media_id", "txt")
      .select(col("media_id"), col("txt").cast("binary").as("payload"))
    val got = Multimodal.mediaNearDupPairs(media, maxHamming = 3)
      .orderBy("id_a", "id_b").collect()
    graft.core.OpCaches.release()
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(gotPairs.exists { case (a, b, h) => a == 7L && b == 100L && h == 0 },
      s"exact dup not found: ${gotPairs.mkString(" ")}")
    // all-pairs reference: same signature, brute-force hamming filter
    val signed = media.select(col("media_id"),
      perceptual_hash64(col("payload")).as("sig"))
    val all = signed.as("a").crossJoin(signed.as("b"))
      .filter(col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(gotPairs.toSeq == all.toSeq,
      "banded result must exactly equal the all-pairs hamming filter")
  }

  test("multimodal: frame near-dup matches a brute-force all-pairs rollup") {
    import graft.functions.HashKernels
    // ~3-frame payloads (128-byte frames): an exact dup, a two-frame
    // edit, a SHIFTED copy (any-to-any frame matching must still pair
    // it), and an unrelated short doc
    def body(seed: Long, n: Int): String =
      new String(Array.tabulate[Char](n)(j => ('a' + (seed * 13 + j * 7) % 26).toChar))
    val base = (0L until 25L).map(i => (i, body(i, 300)))
    val planted = base ++ Seq(
      (200L, base(3)._2),                                   // exact dup
      (201L, base(5)._2.updated(10, 'Z').updated(200, 'Q')), // per-frame edits
      (202L, "XYZPAD:" + base(8)._2),                       // shifted copy
      (203L, "ab"))                                         // sub-gram doc
    val media = planted.toDF("media_id", "txt")
      .select(col("media_id"), col("txt").cast("binary").as("payload"))
    val got = Multimodal.frameNearDupPairs(media,
        frameBytes = 128, maxHamming = 3, minFrames = 2)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    graft.core.OpCaches.release()
    assert(got.exists { case (a, b, n, h) => a == 3L && b == 200L && h == 0 },
      s"exact dup not found: ${got.mkString(" ")}")
    assert(!got.exists { case (a, b, _, _) => a == 203L || b == 203L },
      "sub-gram doc must not pair")
    // brute-force reference: same slicing + kernel, all-pairs hamming
    val frames = planted.filter(_._2.length >= 4).flatMap { case (id, txt) =>
      txt.getBytes("UTF-8").grouped(128).zipWithIndex.collect {
        case (slice, fi) if slice.length >= 4 =>
          (id, fi, HashKernels.perceptualHash64(slice))
      }
    }
    val want = (for {
      (da, _, sa) <- frames; (db, _, sb) <- frames
      if da < db && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield ((da, db), java.lang.Long.bitCount(sa ^ sb)))
      .groupBy(_._1).map { case ((a, b), hs) =>
        (a, b, hs.size.toLong, hs.map(_._2).min) }
      .filter(_._3 >= 2L).toSeq.sorted
    assert(got.toSeq == want,
      s"banded rollup != all-pairs reference\n got: ${got.mkString(" ")}\nwant: ${want.mkString(" ")}")
  }

  test("multimodal features compose with similarity search") {
    val emb = Multimodal.featureEmbeddings(Multimodal.syntheticMedia(spark, 50))
    val topk = Similarity.cosineTopK(emb, emb.filter($"vec_id" < 2), 3)
    assert(topk.count() == 6)
  }

  test("streaming: windowed agg over the events stream matches batch") {
    val dir = sf("sf0.001")
    // file-stream sources watch a directory: stage the single parquet
    // file behind a symlink dir
    val streamDir = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val streamed = EventsStream.readEvents(spark, streamDir.toString)
    assert(streamed.isStreaming)
    val q = EventsStream.windowedAgg(streamed)
      .writeStream.format("memory").queryName("hourly").outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("hourly")
      .orderBy("window_start", "event_type")
      .collect()
    val batch = EventsStream.windowedAgg(
      Tables.events(spark, dir)
        .withColumn("event_time", expr("timestamp_micros(ts div 1000)")))
      .orderBy("window_start", "event_type")
      .collect()
    assert(got.toSeq == batch.toSeq)
    assert(got.nonEmpty)
  }

  test("streaming: substring-dup screen marks exactly the corpus-duplicated windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // corpus with one duplicated 8-token boilerplate block (docs 1, 2)
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, s"intro one two $boiler tail alpha"),
      (2L, s"other opening words $boiler different ending here"),
      (3L, "an entirely unique document with no repeats at all"))
      .toDF("doc_id", "text")
    val ms = MemoryStream[(Long, String)]
    val screened = graft.streaming.DocsStream.substringDupScreen(
      ms.toDF().toDF("doc_id", "text"), corpus, windowTokens = 8)
    assert(screened.isStreaming)
    val q = screened.writeStream.format("memory").queryName("sub_screen")
      .outputMode("append").start()
    try {
      // doc 100 embeds the boilerplate; doc 101 is clean; doc 102 too
      // short for any window
      ms.addData((100L, s"fresh start $boiler and then new text"),
        (101L, "completely novel content with nothing shared anywhere ok"),
        (102L, "too short"))
      q.processAllAvailable()
      val got = spark.table("sub_screen")
        .orderBy("doc_id", "s").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // exactly the one 8-token window of doc 100 whose key is
      // corpus-duplicated: tokens 3..10 (1-based: after "fresh start")
      assert(got == Seq((100L, 3L, 10L)), got.toString)
      // parity: the batch marking stage over the same frame agrees
      val batchWins = graft.operators.SubstringDedup
        .windowKeys(Seq((100L, s"fresh start $boiler and then new text"))
          .toDF("doc_id", "text"), 8, "doc_id", "text")
        .join(graft.operators.SubstringDedup.duplicatedWindowKeys(corpus, 8),
          Seq("h1", "h2"), "left_semi")
        .select(col("doc_id"), col("s"), (col("s") + 7L).as("e"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == batchWins, s"stream $got != batch $batchWins")
    } finally q.stop()
  }

  test("streaming: DSIR score screen equals the stored serving form") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the log"),
      (3L, "de", "der hund sitzt auf dem baum"),
      (4L, "de", "die katze schläft auf dem sofa"))
      .toDF("doc_id", "lang", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-dsirscreen").toString
    corpus.write.mode("overwrite").parquet(path)
    val stored = spark.read.parquet(path)
    val batchDocs = Seq(
      (100L, "x", "the cat sat on the log"),   // target-like
      (101L, "x", "der hund auf dem sofa"),    // off-target
      (102L, "x", "zz unseen tokens entirely"),// all-unseen buckets
      (103L, "x", " "))                        // no tokens -> absent
      .toDF("doc_id", "lang", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val served = graft.operators.Dsir.scoreBatchPrebuilt(
      stored, path, batchDocs, col("lang") === "en", buckets = 64,
      variant = "en")
      .collect().map(key).toSet
    val ms = MemoryStream[(Long, String, String)]
    val screened = graft.streaming.DocsStream.dsirScoreScreen(
      ms.toDF().toDF("doc_id", "lang", "text"), stored,
      col("lang") === "en", buckets = 64)
    assert(screened.isStreaming)
    val q = screened.writeStream.format("memory").queryName("dsir_screen")
      .outputMode("append").start()
    try {
      ms.addData((100L, "x", "the cat sat on the log"),
        (101L, "x", "der hund auf dem sofa"),
        (102L, "x", "zz unseen tokens entirely"), (103L, "x", " "))
      q.processAllAvailable()
      val got = spark.table("dsir_screen").collect().map(key).toSet
      assert(got == served && got.size == 3, s"stream $got != served $served")
      val m = got.map(t => t._1 -> t._3).toMap
      assert(m(100L) > m(101L), m) // target-like outranks off-target
    } finally q.stop()
  }

  test("streaming: ingest composition (dup screen -> DSIR score) matches the batch pipeline across arrival waves") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // The registered ingest_pipeline row composes the two serving
    // forms in batch; this pins the STREAMING twins composed the same
    // way — screens as stateless queries, the doc-grain dup gate at
    // compaction (per the screen scaladocs' division of labour) — and
    // does it across TWO arrival waves, so incremental arrival is
    // pinned equal to one-shot batch processing (doc-grain ops must
    // not depend on micro-batch boundaries).
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, "en", s"intro one two $boiler tail alpha"),
      (2L, "en", s"other opening words $boiler different ending here"),
      (3L, "en", "the cat sat on the mat quietly today"),
      (4L, "de", "der hund sitzt auf dem baum heute"))
      .toDF("doc_id", "lang", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft-ingestpar").toString
    corpus.write.mode("overwrite").parquet(path)
    val stored = spark.read.parquet(path)
    val arrivals = Seq(
      (100L, "x", s"fresh start $boiler and then new text"), // boilerplate: screened out
      (101L, "x", "the cat sat on the mat again"),           // kept, target-like
      (102L, "x", "der hund auf dem baum wieder einmal"),    // kept, off-target
      (103L, "x", "short clean"))                            // < w tokens: no window, kept
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    // batch composition (the ingest_pipeline pre-pack stage)
    val batchDf = arrivals.toDF("doc_id", "lang", "text")
    val hit = graft.operators.SubstringDedup.dupScreenBatchPrebuilt(
      stored, path, batchDf, windowTokens = 8, variant = "ingestparity")
      .select("doc_id").distinct()
    val batchScored = graft.operators.Dsir.scoreBatchPrebuilt(
      stored, path, batchDf.join(hit, Seq("doc_id"), "left_anti"),
      col("lang") === "en", buckets = 64, variant = "ingestparity-en")
      .collect().map(key).toSet
    // streaming: both screens as independent stateless queries over
    // the same arrivals in two waves
    val dupKeys = graft.operators.SubstringDedup.storedDupKeys(
      stored, path, windowTokens = 8, variant = "ingestparity")
    val msMarks = MemoryStream[(Long, String, String)]
    val marksQ = graft.streaming.DocsStream.substringDupScreenKeys(
      msMarks.toDF().toDF("doc_id", "lang", "text"), dupKeys,
      windowTokens = 8)
      .writeStream.format("memory").queryName("ingest_marks")
      .outputMode("append").start()
    val msScores = MemoryStream[(Long, String, String)]
    val scoresQ = graft.streaming.DocsStream.dsirScoreScreen(
      msScores.toDF().toDF("doc_id", "lang", "text"), stored,
      col("lang") === "en", buckets = 64)
      .writeStream.format("memory").queryName("ingest_scores")
      .outputMode("append").start()
    try {
      val (wave1, wave2) = arrivals.splitAt(2)
      msMarks.addData(wave1); msScores.addData(wave1)
      marksQ.processAllAvailable(); scoresQ.processAllAvailable()
      msMarks.addData(wave2); msScores.addData(wave2)
      marksQ.processAllAvailable(); scoresQ.processAllAvailable()
      // compaction: drop every doc the screen marked, keep the scores
      val streamScored = spark.table("ingest_scores")
        .join(spark.table("ingest_marks").select("doc_id").distinct(),
          Seq("doc_id"), "left_anti")
        .collect().map(key).toSet
      assert(streamScored == batchScored,
        s"stream $streamScored != batch $batchScored")
      assert(streamScored.map(_._1) == Set(101L, 102L, 103L))
    } finally { marksQ.stop(); scoresQ.stop() }
  }

  test("streaming: token-id encode against a fitted vocabulary matches batch") {
    // the vocabulary is a fit artifact; the encode pass is a
    // stateless stream-static broadcast join, so an ingest stream
    // encodes identically to the batch path
    import graft.operators.Vocab
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    val vocab = Vocab.buildVocab(docs, 50)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-vocab")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("documents.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val streamed = spark.readStream.schema(docs.schema)
      .parquet(streamDir.toString)
    val q = Vocab.encodeTokens(streamed, vocab)
      .writeStream.format("memory").queryName("venc").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("venc").orderBy("doc_id", "pos")
      .collect().map(_.toSeq).toSeq
    val batch = Vocab.encodeTokens(docs, vocab)
      .orderBy("doc_id", "pos").collect().map(_.toSeq).toSeq
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("streaming: OHLC bars match batch AND the TimeSeries grid operator") {
    val dir = sf("sf0.001")
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ohlc")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val streamed = EventsStream.readEvents(spark, streamDir.toString)
    val q = EventsStream.ohlcAgg(streamed)
      .writeStream.format("memory").queryName("ohlc").outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ohlc")
      .orderBy("event_type", "window_start").collect()
    // twin 1: the same function over the batch frame
    val batchEvents = Tables.events(spark, dir)
      .withColumn("event_time", expr("timestamp_micros(ts div 1000)"))
    val batch = EventsStream.ohlcAgg(batchEvents)
      .orderBy("event_type", "window_start").collect()
    assert(got.toSeq == batch.toSeq)
    assert(got.nonEmpty)
    // twin 2: the batch grid operator — window(15 min) starts are the
    // same instants as the epoch-nanos bucket grid, and every bar
    // value must agree bit-for-bit
    val grid = graft.operators.TimeSeries.resampleOhlc(
        Tables.events(spark, dir), 900000000000L, Seq("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getDouble(7))).toSeq
    val fromStream = got.map(r => (r.getString(1),
      r.getTimestamp(0).toInstant.getEpochSecond,
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
      r.getLong(6), r.getDouble(7))).toSeq.sortBy(t => (t._1, t._2))
    assert(fromStream == grid.sortBy(t => (t._1, t._2)))
  }

  test("streaming: NTZ event_time derivation is session-timezone-free") {
    // mirror of the IoSuite batch pin (Tables.events): the NTZ
    // wall-clock is UTC by convention, so readEvents under a non-UTC
    // session must yield the same instants as the long-nanos layout —
    // a cast-through-LTZ would shift every event_time by the offset
    val us = Seq(1704067200000000L, 1704067201500000L)
    val buildDir = java.nio.file.Files.createTempDirectory("graft-ev-build")
    us.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("event_id", "us")
      .select($"event_id", expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"))
      .coalesce(1)
      .write.mode("overwrite").parquet(buildDir.toString)
    // stage the single part file under the watched dir (file-stream
    // sources list top-level entries; a nested directory would not
    // batch-infer)
    val part = new java.io.File(buildDir.toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val ntzDir = java.nio.file.Files.createTempDirectory("graft-ev-ntz")
    java.nio.file.Files.copy(part.toPath, ntzDir.resolve("events.parquet"))
    val tzKey = "spark.sql.session.timeZone"
    val orig = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val streamed = EventsStream.readEvents(spark, ntzDir.toString)
        .select($"event_id", expr("unix_micros(event_time)").as("em"))
      val q = streamed.writeStream.format("memory").queryName("ntz_tz")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("ntz_tz").orderBy("event_id")
        .select("em").as[Long].collect().toSeq
      assert(got == us, s"event_time is session-tz-dependent: $got vs $us")
    } finally spark.conf.set(tzKey, orig)
  }

  test("streaming: dedup within watermark drops duplicate keys") {
    val dir = sf("sf0.001")
    val streamDir = java.nio.file.Files.createTempDirectory("graft-dup")
    // stage the same file twice -> every event_id arrives twice
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("a.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("b.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val streamed = EventsStream.readEvents(spark, streamDir.toString)
    val q = EventsStream.streamingDedup(streamed, Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val total = spark.table("dedup_stream").count()
    val distinctIds = Tables.events(spark, dir)
      .select("event_id").distinct().count()
    assert(total == distinctIds)
  }

  test("streaming: event-time timeout flushes an idle user's final session") {
    import EventsStream.{Event, Session}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventsStream.sessionize(ms.toDS(), gapMs = 30 * 60 * 1000,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_timeout")
      .outputMode("append").start()
    try {
      // user 1's only session — then user 1 never returns (timestamps
      // sit above the initial watermark 0 so nothing is late)
      ms.addData(Event(0, 1, "a", 1.0, 1000000L), Event(1, 1, "a", 2.0, 1060000L))
      q.processAllAvailable()
      assert(spark.table("sess_timeout").count() == 0) // still open
      // unrelated user far in the future advances the watermark past
      // user 1's gap horizon (timeouts fire on the NEXT trigger after
      // the watermark update)
      ms.addData(Event(2, 2, "b", 3.0, 100000000L))
      q.processAllAvailable()
      ms.addData(Event(3, 2, "b", 1.0, 100000001L))
      q.processAllAvailable()
      val got = spark.table("sess_timeout").as[Session].collect()
      assert(got.exists(s => s.user_id == 1 && s.n_events == 2 &&
        s.session_start_ms == 1000000L && s.session_end_ms == 1060000L &&
        s.total_value == 3.0), got.toSeq.toString)
    } finally q.stop()
  }

  test("streaming: stateful sessionize matches the batch twin") {
    import EventsStream.Event
    val events = Seq(
      Event(0, 1, "a", 1.0, 0L), Event(1, 1, "a", 2.0, 60000L),
      Event(2, 1, "b", 3.0, 10000000L), // new session for user 1
      Event(3, 2, "a", 4.0, 500L)
    ).toDS()
    // streaming path (batch Dataset drives the same typed operator
    // minus state timeouts)
    val sessions = EventsStream.sessionize(events, gapMs = 30 * 60 * 1000)
      .collect().sortBy(s => (s.user_id, s.session_start_ms))
    // only CLOSED sessions are emitted: user 1's first session closes
    // when event 2 arrives; open sessions stay in state
    assert(sessions.length == 1)
    assert(sessions(0).user_id == 1 && sessions(0).n_events == 2 &&
      sessions(0).total_value == 3.0)
    val batchTwin = EventsStream.sessionizeBatch(
      events.toDF(), gapMs = 30 * 60 * 1000)
      .orderBy("user_id", "session_start_ms").collect()
    // batch twin sees ALL sessions (2 for user 1, 1 for user 2)
    assert(batchTwin.length == 3)
    assert(batchTwin.head.getAs[Int]("n_events") == 2)
  }

  test("streaming: row-local minhash signature equals the batch explode+groupBy form") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf("sf0.001"))
    val rowForm = docs.select(col("doc_id"),
        graft.streaming.DocsStream.rowSignature(col("text")).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val batchForm = graft.operators.Dedup.minHashSignatures(
        docs, "text", "doc_id", 3, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rowForm == batchForm)
  }

  test("streaming: contamination screen flags the same docs as the batch operator") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    val benchPred = col("doc_id") % 97 === 1
    val streamDir = java.nio.file.Files.createTempDirectory("graft-contam")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("batch.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val arriving = graft.streaming.DocsStream
      .readDocuments(spark, streamDir.toString)
    val q = graft.streaming.DocsStream
      .contaminationScreen(arriving, docs.filter(benchPred))
      .writeStream.format("memory").queryName("contam_screen")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamedIds = spark.table("contam_screen")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val batchIds = graft.operators.Dedup.contaminatedDocs(
        docs, docs.filter(benchPred))
      .collect().map(_.getLong(0)).toSet
    assert(streamedIds == batchIds)
    assert(streamedIds.nonEmpty)
  }

  test("streaming: near-dup screening vs static corpus matches the batch incremental operator") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    val newPred = col("doc_id") % 5 === 0
    // stage the full documents file as the arriving stream; the
    // screen only considers rows matching the new-batch predicate
    val streamDir = java.nio.file.Files.createTempDirectory("graft-docs")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("batch.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val arriving = graft.streaming.DocsStream
      .readDocuments(spark, streamDir.toString)
      .filter(newPred)
    val q = graft.streaming.DocsStream
      .nearDupAgainstCorpus(arriving, docs.filter(!newPred))
      .writeStream.format("memory").queryName("docs_screen")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // at-least-once per pair (once per shared band): distinct +
    // normalize, then compare against the batch operator's
    // new-vs-corpus subset (it also emits new-vs-new, which the
    // stream leaves to compaction)
    val streamed = spark.table("docs_screen")
      .select(least(col("new_id"), col("corpus_id")).as("id_a"),
        greatest(col("new_id"), col("corpus_id")).as("id_b"),
        col("est_jaccard"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.core.OpCaches.release()
    val isNew = (id: Long) => id % 5 == 0
    val batch = graft.operators.Dedup.incrementalMinHashCandidates(
        docs.filter(newPred), docs.filter(!newPred))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(p => isNew(p._1) ^ isNew(p._2)).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty, "vacuous screen — adjust the split")
  }

  test("streaming: prebuilt near-dup screen is route-identical to the inline screen") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // copy-heavy corpus: two duplicate groups, three uniques, one
    // shingle-less, one null text — the corpus shape whose RAW band
    // index pays copies(batch) x copies(corpus) per bucket
    val t1 = "alpha beta gamma delta epsilon zeta"
    val t2 = "one two three four five six"
    val corpusRows = Seq(
      (1L, t1), (2L, t1), (3L, t1), (4L, t1),
      (5L, t2), (6L, t2), (7L, t2),
      (8L, "the quick brown fox jumps over the lazy dog"),
      (9L, "pack my box with five dozen liquor jugs"),
      (10L, "sphinx of black quartz judge my vow today"),
      (11L, "tiny"), (12L, null.asInstanceOf[String]))
    val dir = java.nio.file.Files.createTempDirectory("graft-ndpb").toString
    val corpusPath = s"$dir/corpus.parquet"
    corpusRows.toDF("doc_id", "text").write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val variant = s"ndpb-${java.util.UUID.randomUUID().toString.take(8)}"
    // the stamp itself: 6 of 11 non-null texts are duplicate copies
    assert(graft.operators.Dedup.storedDupFraction(
      corpus, corpusPath, "text", "doc_id", variant, force = false)
      > graft.operators.Dedup.DefaultDupGate,
      "fixture must be copy-heavy so the stamped route collapses")
    // arriving batch: an exact corpus copy, a batch-internal duplicate
    // of it, a corpus-id-colliding copy (the self-pair filter case), a
    // near-variant, a unique, and a shingle-less row
    val batchRows = Seq(
      (101L, t1), (105L, t1), (1L, t1),
      (102L, "one two three four five seven"),
      (103L, "completely novel content nothing shares"),
      (104L, "x y"))
    def screened(mk: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame, sink: String): Set[(Long, Long, Int, Double)] = {
      val ms = MemoryStream[(Long, String)]
      val q = mk(ms.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try { ms.addData(batchRows: _*); q.processAllAvailable() }
      finally q.stop()
      val got = spark.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      // every (new, corpus, band) row is unique in both forms — a Set
      // loses nothing, and duplicate emission would break that
      assert(got.length == got.toSet.size, s"$sink emitted duplicate rows")
      got.toSet
    }
    val inline = screened(s => graft.streaming.DocsStream
      .nearDupAgainstCorpus(s, corpus), "ndpb_inline")
    val raw = screened(s => graft.streaming.DocsStream
      .nearDupAgainstCorpusPrebuilt(s, corpus, corpusPath,
        variant = variant, dupGate = 1.0), "ndpb_raw")
    val v2 = screened(s => graft.streaming.DocsStream
      .nearDupAgainstCorpusPrebuilt(s, corpus, corpusPath,
        variant = variant, dupGate = -1.0), "ndpb_v2")
    val stamped = screened(s => graft.streaming.DocsStream
      .nearDupAgainstCorpusPrebuilt(s, corpus, corpusPath,
        variant = variant), "ndpb_stamped")
    assert(raw == inline, "raw stored route diverged from inline")
    assert(v2 == inline, "collapsed v2 route diverged from inline")
    assert(stamped == inline, "stamped route diverged from inline")
    // non-vacuous: the exact copies hit every corpus copy of t1 on all
    // 4 bands at estimate 1.0, and the id-1 self-pair is absent
    assert(inline.count(p => p._1 == 101L && p._4 == 1.0) == 16,
      s"expected 4 corpus copies x 4 bands for new_id=101: $inline")
    assert(!inline.exists(p => p._1 == 1L && p._2 == 1L))
    assert(inline.exists(p => p._1 == 1L && p._2 == 2L))
  }

  test("streaming: winnow fingerprints and gopher gate run stateless, match batch") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-wg")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("batch.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val arriving = graft.streaming.DocsStream
      .readDocuments(spark, streamDir.toString)
    val q1 = graft.operators.Fingerprint.winnowFingerprints(arriving, 3, 4)
      .writeStream.format("memory").queryName("winnow_stream")
      .outputMode("append").start()
    try q1.processAllAvailable() finally q1.stop()
    val q2 = graft.operators.Curation.gopherGate(arriving, minTokens = 25)
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    val winnowStream = spark.table("winnow_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val winnowBatch = graft.operators.Fingerprint.winnowFingerprints(docs, 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(winnowStream == winnowBatch && winnowStream.nonEmpty)
    val gateStream = spark.table("gopher_stream")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val gateBatch = graft.operators.Curation.gopherGate(docs, minTokens = 25)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(gateStream == gateBatch && gateStream.values.toSet == Set(0, 1))
  }

  test("streaming: token-window chunking is stateless and matches batch") {
    // chunkByTokens is a pure per-row explode, so it must run
    // unchanged on a streaming frame (no state, no watermark) and
    // emit the exact batch rows
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-chunk")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("batch.parquet"),
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val arriving = graft.streaming.DocsStream
      .readDocuments(spark, streamDir.toString)
    val q = graft.operators.Chunking.chunkByTokens(arriving, 32, 24)
      .writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("chunk_stream")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3))).toSet
    val batch = graft.operators.Chunking.chunkByTokens(docs, 32, 24)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
