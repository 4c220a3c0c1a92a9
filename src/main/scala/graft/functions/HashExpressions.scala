package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for content hashing. Both stay inside
  * whole-stage codegen by emitting a call to a static JVM kernel —
  * no UDF serialization, no codegen fallback.
  */
object HashKernels {
  /** 64-bit FNV-1a over UTF-8 bytes. Public-domain algorithm;
    * deterministic across JVMs.
    */
  def fnv1a64(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Polynomial rolling hash over UTF-8 bytes (base 1000003, natural
    * 64-bit wraparound). The streaming-updatable document fingerprint.
    */
  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** 64-bit SimHash over whitespace tokens: FNV-1a per token, per-bit
    * +1/-1 majority vote packed into a long.
    */
  def simHash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](64)
    var start = 0
    var i = 0
    def addToken(from: Int, until: Int): Unit = {
      if (until > from) {
        val h = fnv1a64(bytes, from, until)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    while (i < bytes.length) {
      // ASCII whitespace split (full Java-regex \s set, incl. \f and
      // \x0B, matching the oracle's regexp split) — tokens are byte
      // runs between blanks
      val c = bytes(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0b) {
        addToken(start, i)
        start = i + 1
      }
      i += 1
    }
    addToken(start, bytes.length)
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 48 bits (6 bytes big-endian) of the MD5 digest —
    * numerically `('0x' || substr(md5_hex, 1, 12))::BIGINT`.
    */
  def md5Prefix48(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 6) {
      h = (h << 8) | (d(i) & 0xffL)
      i += 1
    }
    h
  }

  /** First 64 bits (8 bytes big-endian) of the MD5 digest — the same
    * bit pattern as `('0x' || substr(md5_hex, 1, 16))::UBIGINT`
    * (signed here, unsigned there; the 64 bits are identical).
    */
  def md5Long64(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) {
      h = (h << 8) | (d(i) & 0xffL)
      i += 1
    }
    h
  }

  /** 64-bit perceptual signature over an opaque BINARY payload:
    * per-bit +1/-1 majority vote over the [[md5Long64]] of every
    * SLIDING 4-byte gram (offsets 0..len-4). The locality contract
    * of a real perceptual hash (pHash DCT bits: similar media ->
    * nearby signatures) expressed at the byte level — payloads
    * sharing most of their content share most grams, so their
    * signatures land within small Hamming distance, while the MD5
    * gram hash keeps every bit SQL-replayable
    * (`('0x' || substr(md5(substr(payload, i, 4)), 1, 16))::UBIGINT`
    * on ASCII-representable payloads). Payloads shorter than 4 bytes
    * have no grams and sign to 0L. A real build swaps the gram
    * stream for decoded frame/spectral coefficients; the banding,
    * verify, and SQL mirror are unchanged.
    */
  def perceptualHash64(bytes: Array[Byte]): Long = {
    val counts = new Array[Int](64)
    val md = md5Local.get()
    var i = 0
    while (i + 4 <= bytes.length) {
      md.reset()
      md.update(bytes, i, 4)
      val d = md.digest()
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** 64-bit SimHash with MD5 token hashes: whitespace tokens, per-bit
    * +1/-1 majority vote over each token's [[md5Long64]]. Unlike the
    * FNV variant ([[simHash64]]) every building block (whitespace
    * split, md5, bit test) exists in ANSI-ish SQL, so a DuckDB oracle
    * can reproduce the signature bit-for-bit.
    *
    * Same zero-allocation byte walk as [[simHash64]] (tokens are byte
    * runs between ASCII blanks; the digest reads the run in place) —
    * no per-row regex or token-array allocation on the hot path.
    */
  def simHashMd5(s: UTF8String): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](64)
    val md = md5Local.get()
    var start = 0
    var i = 0
    def addToken(from: Int, until: Int): Unit = {
      if (until > from) {
        md.reset()
        md.update(bytes, from, until - from)
        val d = md.digest()
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    while (i < bytes.length) {
      val c = bytes(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0b) {
        addToken(start, i)
        start = i + 1
      }
      i += 1
    }
    addToken(start, bytes.length)
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** MD5 digest split into two exact 48-bit longs: bytes 0-5 and 6-11
    * big-endian — numerically identical to `conv(substring(hex, 1, 12),
    * 16, 10)` / `(13, 12)` on the hex form, with no hex string
    * materialized and no string-to-int parse.
    */
  def md5Pair(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < 6) {
      h1 = (h1 << 8) | (d(i) & 0xffL)
      h2 = (h2 << 8) | (d(i + 6) & 0xffL)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(h1, h2))
  }
}

/** `md5_pair(text)`: array(h1, h2) of exact 48-bit MD5 halves — the
  * Carter-Wegman seed pair for minhash, computed without the hex
  * round-trip of md5()+conv().
  */
case class Md5Pair(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"md5_pair needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    HashKernels.md5Pair(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.md5Pair($c)")
  override protected def withNewChildInternal(c: Expression): Md5Pair = copy(c)
}

/** `rolling_hash(text)`: 64-bit polynomial content fingerprint. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  def inputTypes: Seq[DataType] = Seq(StringType)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"rolling_hash needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    HashKernels.rollingHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): RollingHash = copy(c)
}

/** `perceptual_hash64(payload)`: 64-bit perceptual signature of an
  * opaque BINARY payload (sliding 4-byte MD5 grams, per-bit majority
  * vote — [[HashKernels.perceptualHash64]]), the oracle-expressible
  * media near-dup signature.
  */
case class PerceptualHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def checkInputDataTypes() =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"perceptual_hash64 needs BINARY, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    HashKernels.perceptualHash64(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.perceptualHash64($c)")
  override protected def withNewChildInternal(c: Expression): PerceptualHash64 = copy(c)
}

/** `simhash_md5(text)`: 64-bit near-duplicate signature with MD5 token
  * hashes — the oracle-expressible simhash variant.
  */
case class SimHashMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  def inputTypes: Seq[DataType] = Seq(StringType)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"simhash_md5 needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    HashKernels.simHashMd5(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simHashMd5($c)")
  override protected def withNewChildInternal(c: Expression): SimHashMd5 = copy(c)
}

/** `simhash64(text)`: 64-bit near-duplicate signature. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  def inputTypes: Seq[DataType] = Seq(StringType)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"simhash64 needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    HashKernels.simHash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simHash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

object HashFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def rolling_hash(c: Column): Column = column(RollingHash(expression(c)))
  def simhash64(c: Column): Column = column(SimHash64(expression(c)))
  def simhash_md5(c: Column): Column = column(SimHashMd5(expression(c)))
  def perceptual_hash64(c: Column): Column = column(PerceptualHash64(expression(c)))
  def md5_pair(c: Column): Column = column(Md5Pair(expression(c)))
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
  private def bit_count(c: Column): Column =
    org.apache.spark.sql.functions.bit_count(c)
}
