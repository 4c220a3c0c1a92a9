package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-shingle kernel.
  *
  * The declarative form — `array_distinct(transform(sequence(1, m),
  * i => concat_ws(" ", slice(tokens, i, n))))` with `tokens =
  * split(btrim(text), "\\s+")` — re-evaluates the embedded regex
  * split once per shingle index (higher-order lambdas inline their
  * referenced subtrees; CollapseProject undoes any alias staging), so
  * a 100-token document pays ~100 regex splits. Measured: the bare
  * shingle explode was 4.3 s of minhash's 4.5 s at sf0.1. This kernel
  * does one byte walk per document and stays inside whole-stage
  * codegen like [[HashKernels]].
  *
  * Semantics are bit-identical to the declarative form:
  * - btrim strips leading/trailing ASCII spaces (0x20) only;
  * - tokens split on maximal runs of Java-regex `\s` =
  *   [ \t\n\x0B\f\r], keeping a leading/trailing empty token when the
  *   trimmed text starts/ends with such a run (Pattern.split, no
  *   limit) — pinned against the declarative form by a randomized
  *   ScalaCheck property;
  * - fewer than `n` tokens yields an EMPTY array (matching the
  *   `when(size >= n, ...).otherwise(array())` guard);
  * - shingles are n consecutive tokens joined by one space,
  *   de-duplicated keeping first occurrence (array_distinct order).
  */
object ShingleKernels {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // btrim: ASCII space only
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1

    // token spans between maximal whitespace runs, Pattern.split-style
    // (leading empty span if text starts with a run; trailing empty
    // span if it ends with one; empty text -> one empty token)
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = lo
    var tokStart = lo
    while (i < hi) {
      if (isWs(bytes(i))) {
        starts.add(tokStart); ends.add(i)
        while (i < hi && isWs(bytes(i))) i += 1
        tokStart = i
      } else i += 1
    }
    starts.add(tokStart); ends.add(hi)

    val m = starts.size()
    if (m < n) return new GenericArrayData(Array.empty[Any])

    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j <= m - n) {
      // n consecutive tokens joined by a single 0x20
      var len = n - 1
      var k = 0
      while (k < n) { len += ends.get(j + k) - starts.get(j + k); k += 1 }
      val out = new Array[Byte](len)
      var pos = 0
      k = 0
      while (k < n) {
        if (k > 0) { out(pos) = ' '; pos += 1 }
        val tl = ends.get(j + k) - starts.get(j + k)
        System.arraycopy(bytes, starts.get(j + k), out, pos, tl)
        pos += tl
        k += 1
      }
      seen.add(UTF8String.fromBytes(out))
      j += 1
    }
    val arr = new Array[Any](seen.size())
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }
}

/** `word_shingles(text, n)`: distinct n-word shingles of
  * whitespace-tokenized text, one byte walk per row.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType && n >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"word_shingles needs STRING and n >= 1, got ${child.dataType}, n=$n")
  override def nullSafeEval(v: Any): Any =
    ShingleKernels.wordShingles(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.wordShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object ShingleFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def word_shingles(c: Column, n: Int): Column =
    column(WordShingles(expression(c), n))
}
