package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing kernel: the whole
  * [[graft.operators.Fingerprint.winnowFingerprints]] per-document
  * chain — tokenize, positional k-shingle, md5-48 hash, sliding
  * window minima, distinct ascending — in ONE byte walk per row.
  *
  * The declarative HOF form it replaces evaluated an interpreted
  * md5+conv lambda per shingle (~5 µs each: 1.25 s at sf0.1 for 250k
  * shingles, 3.2× the oracle); this kernel pays only the raw MD5
  * cost. `Fingerprint.winnowFingerprintsDeclarative` is the semantic
  * reference it is property-pinned against (OperatorsSuite), and the
  * DuckDB oracle replays the identical hash
  * (`('0x' || substr(md5(shingle), 1, 12))::BIGINT`).
  *
  * Contract (replays the declarative chain EXACTLY): tokens are the
  * NON-EMPTY whitespace-split tokens ([[TextFunctions.tokensNonEmpty]]
  * — full-whitespace trim, so a leading tab/newline does not produce
  * a phantom empty token); fewer than k tokens ⇒ empty array;
  * otherwise windows of width min(w, #shingles) guarantee ≥ 1
  * fingerprint.
  */
object WinnowKernels {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def winnowFps(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1

    // NON-EMPTY token spans only (leading/trailing whitespace runs
    // that btrim's space-only trim leaves — tabs, newlines — would
    // otherwise yield empty edge tokens)
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = lo
    var tokStart = lo
    while (i < hi) {
      if (isWs(bytes(i))) {
        if (i > tokStart) { starts.add(tokStart); ends.add(i) }
        while (i < hi && isWs(bytes(i))) i += 1
        tokStart = i
      } else i += 1
    }
    if (hi > tokStart) { starts.add(tokStart); ends.add(hi) }

    val m = starts.size()
    if (m < k) return new GenericArrayData(Array.empty[Any])

    val nSh = m - k + 1
    val h = new Array[Long](nSh)
    var j = 0
    while (j < nSh) {
      var len = k - 1
      var t = 0
      while (t < k) { len += ends.get(j + t) - starts.get(j + t); t += 1 }
      val out = new Array[Byte](len)
      var pos = 0
      t = 0
      while (t < k) {
        if (t > 0) { out(pos) = ' '; pos += 1 }
        val tl = ends.get(j + t) - starts.get(j + t)
        System.arraycopy(bytes, starts.get(j + t), out, pos, tl)
        pos += tl
        t += 1
      }
      h(j) = HashKernels.md5Prefix48(out)
      j += 1
    }

    // sliding minima: width min(w, nSh), O(nSh * width) — width is a
    // small constant (4 in the registered query); a monotonic deque
    // is not worth its allocation here
    val ws = math.min(w, nSh)
    val nw = nSh - ws + 1
    val mins = new Array[Long](nw)
    j = 0
    while (j < nw) {
      var mn = h(j)
      var t = 1
      while (t < ws) { if (h(j + t) < mn) mn = h(j + t); t += 1 }
      mins(j) = mn
      j += 1
    }
    java.util.Arrays.sort(mins)
    var n = 0
    var p = 0
    while (p < nw) {
      if (p == 0 || mins(p) != mins(p - 1)) { mins(n) = mins(p); n += 1 }
      p += 1
    }
    val arr = new Array[Any](n)
    p = 0
    while (p < n) { arr(p) = mins(p); p += 1 }
    new GenericArrayData(arr)
  }
}

/** `winnow_fps(text, k, w)`: distinct ascending winnowing
  * fingerprints (md5-48 k-shingle hashes, w-window minima).
  */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k > 0 && w > 0, s"winnow_fps needs k > 0 and w > 0, got k=$k w=$w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"winnow_fps needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    WinnowKernels.winnowFps(v.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowKernels.winnowFps($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowFps = copy(child = c)
}

object WinnowFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def winnow_fps(c: Column, k: Int, w: Int): Column =
    column(WinnowFps(expression(c), k, w))
}
