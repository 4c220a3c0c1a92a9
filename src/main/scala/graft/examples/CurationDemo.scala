package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.OpCaches
import graft.functions.TextFunctions
import graft.operators.{Chunking, Components, Curation, Dedup, Packing, Sampling}

/** End-to-end training-data curation pipeline — the composition the
  * individual operators exist for:
  *
  *   documents
  *     -> gopher quality gate    (six published repetition/length rules)
  *     -> exact dedup            (content-hash clusters, keep min id)
  *     -> near-dup removal       (minhash+LSH candidates, est_jaccard
  *                                >= 0.9, transitive components, keep
  *                                the component-minimum id)
  *     -> decontamination        (drop benchmark 8-gram overlaps)
  *     -> quality filter         (top 75% per language by score)
  *     -> token-budget mixing    (per-source cap, best-quality-first)
  *     -> stratified sample      (100 docs per language, hash-ranked)
  *     -> vocab fit + encode     (top-256 terms, docs to token ids)
  *     -> token-window chunking  (32-token chunks, stride 24)
  *     -> sequence packing       (chunk token counts into 64-token bins)
  *     -> parquet sink
  *
  * Every stage is deterministic (content hashes, exact rank cuts), so
  * the funnel counts are reproducible. Run:
  *
  *   sbt "runMain graft.examples.CurationDemo /root/testdata/sf0.01 /tmp/curated"
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft-curated")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-curation-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = funnel(spark, sfDir, outDir)
    println("CURATION_OK " +
      counts.map { case (k, v) => s"$k=$v" }.mkString(" ") + s" out=$outDir")
    spark.stop()
  }

  /** The full gate-to-pack funnel, returning each stage's count in
    * order — exposed (rather than inlined in main) so the golden
    * suite can pin the COMPOSITION of the curation operators on the
    * fixed sf0.001 corpus, not just each operator alone.
    */
  def funnel(spark: SparkSession, sfDir: String,
      outDir: String): Seq[(String, Long)] = {
    val docs = Tables.documents(spark, sfDir)
    val n0 = docs.count()

    // 0. gopher gate: the six published repetition/length rules
    // (token floor tuned to this corpus's 20-80-token docs) — the
    // native single-call gopher_keep, NOT gopherGate().filter(keep):
    // pushdown rewrites the latter into per-rule kernel walks
    val gated = docs.join(
      docs.filter(graft.functions.RepetitionFunctions
          .gopher_keep(col("text"), minTokens = 25))
        .select("doc_id"),
      Seq("doc_id"), "left_semi")
    val n0b = gated.count()

    // 1. exact dedup: one survivor per identical-content cluster
    val exact = Dedup.dedupExact(gated)
    val n1 = exact.count()

    // 2. near-dup removal: minhash+LSH candidates at est_jaccard >=
    // 0.9, resolved to TRANSITIVE components (per-pair higher-id drops
    // over-keep: pairs (1,3),(2,3) would keep both 1 and 2); the
    // component-minimum id survives
    val pairs = Dedup.minHashCandidates(exact)
      .filter(col("est_jaccard") >= 0.9)
    val dupIds = Components.connectedComponents(pairs)
      .filter(col("id") =!= col("label"))
      .select(col("id").as("doc_id"))
    val nearDeduped = exact.join(dupIds, Seq("doc_id"), "left_anti")
    val n2 = nearDeduped.count()

    // 2b. decontamination: drop docs sharing any 8-gram with the
    // "benchmark" slice (doc_id % 97 == 1 plays the eval set)
    val bench = docs.filter(col("doc_id") % 97 === 1)
    val contaminated = Dedup.contaminatedDocs(nearDeduped, bench)
      .select(col("doc_id"))
    val clean = nearDeduped.join(contaminated, Seq("doc_id"), "left_anti")
    val n2b = clean.count()

    // 3. quality filter: top 75% per language by score
    val filtered = Curation.topFraction(
      clean, TextFunctions.qualityScore(col("text")), Seq("lang"),
      "doc_id", 0.75)
    val n3 = filtered.count()

    // 4. data mixing: cap each source's token contribution,
    // best-quality-first (exact integer running total)
    val mixed = Curation.tokenBudget(filtered,
      TextFunctions.qualityScore(col("text")),
      TextFunctions.tokenCount(col("text")),
      Seq("source"), "doc_id", budget = 500L)
    val n4 = mixed.count()

    // 5. deterministic stratified sample: 100 per language
    val sampled = Sampling.stratifiedSampleRows(
      mixed.drop("cum_tokens"), Seq("lang"), "doc_id", 100)

    // 6. chunk the surviving docs into overlapping context windows,
    // then pack chunk token counts into fixed training bins
    val chunks = Chunking.chunkByTokens(sampled, window = 32, stride = 24)
    // collision-free chunk id: a (doc_id, chunk_id) struct orders
    // lexicographically — an arithmetic doc_id * K + chunk_id would
    // collide for any doc with >= K chunks
    val packed = Packing.packSequences(
      chunks.select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"),
        struct(col("doc_id"), col("chunk_id")).as("cid")),
      col("n_chunk_tokens"), Seq.empty, "cid", seqLen = 64L)

    // 6b. tokenizer fit + transform: top-256 vocabulary fitted on
    // the surviving corpus, every doc encoded to token ids (OOV -> 0)
    val encoded = graft.operators.Vocab.encodeTokens(sampled,
      graft.operators.Vocab.buildVocab(sampled, 256))
    // both counts in ONE action — separate count() calls would each
    // re-run the vocab fit + encode (and the funnel above them)
    val tokRow = encoded.agg(
      count(lit(1)).as("n"),
      count(org.apache.spark.sql.functions.when(col("token_id") === 0, 1))
        .as("oov")).first()
    val nTok = tokRow.getLong(0)
    val nOov = tokRow.getLong(1)

    // 7. sink + release the operator-held caches in one call
    OpCaches.materializeAndRelease(sampled)
    sampled.write.mode("overwrite").partitionBy("lang").parquet(outDir)
    val n5 = spark.read.parquet(outDir).count()
    val n6 = chunks.count()
    // countDistinct is null-safe where max(bin_id)+1 would NPE on an
    // empty packed frame; bin ids are dense 0..B-1, so the counts agree
    val n7 = packed.agg(
      org.apache.spark.sql.functions.countDistinct(col("bin_id")))
      .first().getLong(0)

    Seq("in" -> n0, "gated" -> n0b, "exact_dedup" -> n1,
      "near_dedup" -> n2, "decontaminated" -> n2b, "quality" -> n3,
      "mixed" -> n4, "sampled" -> n5, "tokens" -> nTok, "oov" -> nOov,
      "chunks" -> n6, "bins" -> n7)
  }
}
