package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashKernels

/** Typed metadata for an opaque media payload. */
case class MediaMeta(width: Int, height: Int, sampleRate: Int,
    durationMs: Int, format: String)

/** A multimodal row: media as an opaque binary column plus typed
  * metadata. The engine treats payloads as bytes end-to-end; only the
  * (stubbed) codec boundary interprets them.
  */
case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
    meta: MediaMeta)

/** Extracted feature row (payload projected away — see scale note). */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
    feature: Array[Float])

/** Sampled video frame reference. */
case class FrameRef(media_id: Long, frame_ts_ms: Int, frame_fp: Long)

/** Multimodal-column plumbing: decode / feature-extract / resize /
  * frame-sample over opaque `binary` payloads with typed metadata.
  *
  * The actual codecs (image/audio/video decode) are STUBBED with a
  * deterministic byte-level kernel — this container has no media
  * libraries — but everything Spark-side is real and tested: the
  * schema, the typed Dataset API, the per-partition batch shape
  * (`mapPartitions`, one decoder init per partition, mirroring how a
  * JNI/FFI codec would be bound), and the explode-based frame
  * sampling.
  *
  * Scale notes: payloads dominate row size, so every pipeline projects
  * the binary column away before any wide transform — features travel
  * through shuffles, payloads never do. Feature extraction itself is
  * narrow (no shuffle).
  */
object Multimodal {

  val FeatureDim = 8

  /** STUB decoder: deterministic fake "embedding" derived from payload
    * bytes via MD5 — feature k is the first 48 MD5 bits of
    * (payload ++ ":k"), mod 1000, scaled to [0, 1). A real build
    * replaces the body with a codec call; the signature and batch
    * shape are the contract. MD5 (not a bespoke hash) so that for
    * text-representable payloads the whole decode is expressible in
    * SQL — the driver's DuckDB oracle checks `media_features` exactly.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var k = 0
    while (k < FeatureDim) {
      val h = HashKernels.md5Prefix48(payload ++ s":$k".getBytes("UTF-8"))
      out(k) = (h % 1000) / 1000.0f
      k += 1
    }
    out
  }

  /** Deterministic synthetic media corpus (payload bytes derived from
    * the id) — the test stand-in for a real binary-file ingest. The
    * payload is ASCII on purpose: the binary column stays opaque to
    * the engine, but an SQL oracle can reconstruct the bytes and
    * cross-check the full decode pipeline.
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val payload = (s"MEDIA:$id:$kind:" + new String(
        Array.tabulate[Char](64)(i => ('a' + (id * 31 + i) % 26).toChar)))
        .getBytes("UTF-8")
      val meta = kind match {
        case "image" => MediaMeta(640, 480, 0, 0, "png")
        case "audio" => MediaMeta(0, 0, 16000, (1000 + id * 10).toInt, "wav")
        case _ => MediaMeta(1280, 720, 0, (2000 + id * 100).toInt, "mp4")
      }
      MediaRow(id, kind, payload, meta)
    }
  }

  /** Feature extraction: per-partition batched decode (decoder state
    * initialized once per partition — the real-codec batch shape),
    * payload projected away in the output.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (JNI handle, model…)
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length, decodeStub(r.payload))
      }
    }
  }

  /** Resize plumbing: rewrites metadata and (stub) re-encodes the
    * payload; kind-preserving, narrow (no shuffle).
    */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.kind == "image")
        r.copy(meta = r.meta.copy(width = w, height = h),
          payload = r.payload /* STUB: real build re-encodes here */ )
      else r
    }
  }

  /** Frame sampling: one row per sampled timestamp of each video
    * (explode over a generated sequence); frame_fp is the stubbed
    * frame fingerprint.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Int): Dataset[FrameRef] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      (0 until r.meta.durationMs by everyMs).map { ts =>
        FrameRef(r.media_id, ts,
          HashKernels.fnv1a64(r.payload, 0, r.payload.length) ^ ts.toLong)
      }
    }
  }

  /** Media features as an embedding DataFrame, composable with the
    * Similarity operators (payloads long gone by this point).
    */
  def featureEmbeddings(media: Dataset[MediaRow]): DataFrame =
    extractFeatures(media)
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))

  /** Perceptual near-duplicate pairs over opaque media payloads —
    * the dedup path for the binary column type: 64-bit perceptual
    * signature per payload (sliding-byte-gram MD5 simhash,
    * [[graft.functions.PerceptualHash64]] — the codegen'd stand-in
    * for pHash DCT bits; a real build swaps the gram stream for
    * decoded coefficients and keeps everything downstream), 4x16-bit
    * band blocking, exact Hamming verify. Same scale discipline and
    * recall guarantee as [[Dedup.simHashPairs]]: the band self-join
    * never ships signatures, each pair verifies once, and any pair
    * within Hamming distance `maxHamming <= 3` must agree on a band
    * (pigeonhole), so the banded result EXACTLY equals the all-pairs
    * filter — never an all-pairs join.
    *
    * Returns (id_a, id_b, hamming). Cache lifecycle: the (id, sig)
    * projection registers with [[graft.core.OpCaches]]; callers
    * release after materializing.
    */
  def mediaNearDupPairs(media: DataFrame, payloadCol: String = "payload",
      idCol: String = "media_id", maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"maxHamming $maxHamming > 3 breaks the 4x16-band recall guarantee")
    import graft.functions.HashFunctions.{hamming64, perceptual_hash64}
    val signed = media
      .select(col(idCol), perceptual_hash64(col(payloadCol)).as("sig"))
      .transform(graft.core.OpCaches.persistTracked)
    val banded = signed.select(col(idCol),
      posexplode(array((0 until 4).map(b =>
        (col("sig").bitwiseAND(lit(0xffffL << (16 * b)))).cast("long")): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    Dedup.bandedCandidatePairs(banded, signed, idCol, "band_val")
      .select(col("id_a"), col("id_b"),
        hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Frame ids pack (media_id, frame_idx) into one long:
    * `media_id << 20 | frame_idx` — so the banded machinery's plain
    * `id_a < id_b` ordering IS the lexicographic (media, frame) order
    * and the media id is recovered with one shift. 2^20 frames/video
    * bounds payloads at frameBytes * 2^20 (e.g. 128 MiB at 128-byte
    * frames); media ids stay collision-free up to 2^43.
    */
  private val FrameIdxBits = 20

  /** The packed frame id, ENFORCED in-plan: the id is cast to long
    * BEFORE the shift (an IntegerType id would otherwise overflow
    * `shiftleft` at media_id >= 2^11), and a negative id or a frame
    * index past 2^20 fails loudly instead of silently colliding frame
    * ids across videos (which would emit wrong pairs).
    */
  private def packedFrameId(id: Column, pos: Column): Column = {
    val mid = id.cast("long")
    when(mid >= 0 && mid < (1L << (63 - FrameIdxBits)) &&
        pos < (1 << FrameIdxBits),
      shiftleft(mid, FrameIdxBits) + pos)
      .otherwise(raise_error(concat(
        lit("frameNearDupPairs: (media_id, frame_idx) outside packing domain: ("),
        mid.cast("string"), lit(", "), pos.cast("string"), lit(")")))
        .cast("long"))
  }

  /** Frame-level video near-duplicate pairs — the temporal completion
    * of [[mediaNearDupPairs]]: instead of one signature per payload,
    * the payload is cut into consecutive `frameBytes` slices ("frames",
    * the byte-level stand-in for decoded video frames — a real build
    * swaps the slicer for a frame decoder and keeps everything
    * downstream), each frame gets its own 64-bit perceptual signature
    * ([[graft.functions.PerceptualHash64]]), and two videos pair when
    * at least `minFrames` frame pairs agree within Hamming
    * `maxHamming`. Frame matching is any-to-any (not index-aligned),
    * so content that shifted position — the common edit in near-dup
    * video — still matches.
    *
    * Scale shape: the frame self-join is 4x16-bit band-blocked with
    * the exact-recall pigeonhole guarantee of the simhash/media path
    * (any frame pair within Hamming <= 3 shares a band) — never
    * all-pairs over frames; the band shuffle ships (band, fid) only,
    * each surviving frame pair scores once, and the per-video rollup
    * is one count/min aggregation on the tiny matched subset. Frames
    * shorter than 4 bytes (a short final slice) carry no byte-gram and
    * are dropped BEFORE banding — otherwise every tail frame would
    * collapse into one degenerate sig-0 bucket and cross-pair
    * unrelated videos.
    *
    * Returns (id_a, id_b, n_frames, min_hamming) with id_a < id_b;
    * `n_frames` counts matching frame PAIRS (a repeated frame in one
    * video can match several frames of the other).
    */
  def frameNearDupPairs(media: DataFrame, payloadCol: String = "payload",
      idCol: String = "media_id", frameBytes: Int = 128,
      maxHamming: Int = 3, minFrames: Int = 2): DataFrame = {
    require(maxHamming <= 3,
      s"maxHamming $maxHamming > 3 breaks the 4x16-band recall guarantee")
    require(frameBytes >= 4, s"frameBytes $frameBytes < one 4-byte gram")
    import graft.functions.HashFunctions.{hamming64, perceptual_hash64}
    val fb = lit(frameBytes)
    val nFrames = floor((length(col(payloadCol)) + fb - 1) / fb).cast("int")
    val signed = media
      .filter(length(col(payloadCol)) >= 4)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), nFrames - 1),
          k => col(payloadCol).substr(k * fb + lit(1), fb))))
      .filter(length(col("col")) >= 4)
      .select(packedFrameId(col(idCol), col("pos")).as("fid"),
        perceptual_hash64(col("col")).as("sig"))
      .transform(graft.core.OpCaches.persistTracked)
    val banded = signed.select(col("fid"),
      posexplode(array((0 until 4).map(b =>
        (col("sig").bitwiseAND(lit(0xffffL << (16 * b)))).cast("long")): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    Dedup.bandedCandidatePairs(banded, signed, "fid", "band_val")
      .select(
        shiftright(col("id_a"), FrameIdxBits).as("ma"),
        shiftright(col("id_b"), FrameIdxBits).as("mb"),
        hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming && col("ma") < col("mb"))
      .groupBy("ma", "mb")
      .agg(count(lit(1)).as("n_frames"), min("hamming").as("min_hamming"))
      .filter(col("n_frames") >= minFrames)
      .select(col("ma").as("id_a"), col("mb").as("id_b"),
        col("n_frames"), col("min_hamming"))
  }
}
