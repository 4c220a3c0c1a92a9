package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass repetition-profile kernel — the Gopher-family
  * repetition filters (Rae et al., "Scaling Language Models: Methods,
  * Analysis & Insights from Training Gopher", 2021, §A1.1 and the C4 /
  * RefinedWeb descendants): machine-generated and boilerplate text is
  * detected by how much of it repeats, via duplicate-line fractions
  * and repeated / dominant word-n-gram character fractions.
  *
  * All counts are per-document, so the operator is embarrassingly
  * parallel: no shuffle, no explode — one byte walk per document
  * inside whole-stage codegen, same pattern as [[TextProfileKernel]]
  * and [[ShingleKernels]]. The declarative alternative (explode lines
  * / n-grams, two groupBys, re-join per metric) shuffles ~n_tokens
  * rows per document per metric; at 100 TB that is the whole corpus
  * re-shuffled four times for what a scan can compute in place.
  *
  * Everything is returned as exact integer counts (array<bigint>) and
  * the ratios are left to the caller: integers hash-match the DuckDB
  * oracle bit-for-bit, fractions would hinge on double formatting.
  *
  * Conventions (mirrored exactly by the generated oracle SQL):
  *  - lines   = `text` split on '\n' (0x0A never occurs inside a UTF-8
  *              multibyte sequence), empty segments kept — identical
  *              to DuckDB `string_split(text, chr(10))`;
  *  - tokens  = maximal runs of non-`\s` bytes, Java-regex `\s` =
  *              [ \t\n\x0B\f\r]. NOTE: DuckDB/RE2 `'\s'` does NOT
  *              match vertical tab (0x0B), so the oracle must spell
  *              the class out: the non-empty entries of
  *              `regexp_split_to_array(text, '[ \t\n\x0b\f\r]+')`;
  *  - n-grams = adjacent token windows joined with a single space
  *              (' ' cannot occur inside a token, so the joined string
  *              is a collision-free key), char length = sum of token
  *              char lengths + (n-1);
  *  - "chars" = Unicode code points (DuckDB `length()`).
  *
  * Profile layout (array<bigint>):
  *   [0] n_lines          — count of line segments
  *   [1] n_dup_lines      — line instances whose content occurs >1
  *                          time in the document (each instance counts)
  *   [2] dup_line_chars   — Σ count·chars over duplicated line values
  *   [3] line_chars       — Σ count·chars over all line values
  *   [4] top2gram_chars   — max over word 2-grams of count·chars
  *                          (0 when the document has <2 tokens)
  *   [5] dup5gram_chars   — Σ count·chars over 5-grams with count >1
  *   [6] n_tokens         — non-empty token count
  *   [7] token_chars      — Σ chars over all tokens
  *
  * Derived filters (caller-side): dup_line_frac = [1]/[0],
  * dup_line_char_frac = [2]/[3], top_2gram_char_frac = [4]/[7],
  * dup_5gram_char_frac = [5]/[7] — Gopher's published cut-offs are
  * 0.30 / 0.20 / 0.20 / 0.15 respectively.
  */
object RepetitionKernel {

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** value: (count, charLen) packed as a 2-slot long array */
  private type Counts = java.util.HashMap[UTF8String, Array[Long]]

  private def bump(m: Counts, key: UTF8String): Unit = {
    val slot = m.get(key)
    if (slot == null) m.put(key, Array(1L, key.numChars().toLong))
    else slot(0) += 1
  }

  def repetitionProfile(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length

    // --- lines: split on '\n', empty segments kept ---
    val lineCounts = new Counts()
    var nLines = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == '\n') {
        bump(lineCounts, UTF8String.fromBytes(bytes, start, i - start))
        nLines += 1
        start = i + 1
      }
      i += 1
    }
    var nDupLines = 0L
    var dupLineChars = 0L
    var lineChars = 0L
    val lit = lineCounts.values().iterator()
    while (lit.hasNext) {
      val slot = lit.next()
      val contrib = slot(0) * slot(1)
      lineChars += contrib
      if (slot(0) > 1) { nDupLines += slot(0); dupLineChars += contrib }
    }

    // --- tokens: maximal non-whitespace runs ---
    val tokStart = new java.util.ArrayList[Integer]()
    val tokEnd = new java.util.ArrayList[Integer]()
    var tokenChars = 0L
    i = 0
    var inTok = false
    start = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        if (inTok) { tokStart.add(start); tokEnd.add(i); inTok = false }
      } else if (!inTok) { start = i; inTok = true }
      i += 1
    }
    if (inTok) { tokStart.add(start); tokEnd.add(n) }
    val nTok = tokStart.size()
    var t = 0
    while (t < nTok) {
      tokenChars += UTF8String.fromBytes(
        bytes, tokStart.get(t), tokEnd.get(t) - tokStart.get(t)).numChars()
      t += 1
    }

    // space-joined n-gram key over tokens [from, from+width)
    def gramKey(from: Int, width: Int): UTF8String = {
      var len = width - 1 // the joining spaces
      var j = 0
      while (j < width) { len += tokEnd.get(from + j) - tokStart.get(from + j); j += 1 }
      val out = new Array[Byte](len)
      var pos = 0
      j = 0
      while (j < width) {
        if (j > 0) { out(pos) = ' '; pos += 1 }
        val l = tokEnd.get(from + j) - tokStart.get(from + j)
        System.arraycopy(bytes, tokStart.get(from + j), out, pos, l)
        pos += l
        j += 1
      }
      UTF8String.fromBytes(out)
    }

    def gramStats(width: Int): (Long, Long) = {
      if (nTok < width) return (0L, 0L)
      val m = new Counts()
      var g = 0
      while (g + width <= nTok) { bump(m, gramKey(g, width)); g += 1 }
      var top = 0L
      var dup = 0L
      val it = m.values().iterator()
      while (it.hasNext) {
        val slot = it.next()
        val contrib = slot(0) * slot(1)
        if (contrib > top) top = contrib
        if (slot(0) > 1) dup += contrib
      }
      (top, dup)
    }

    val (top2, _) = gramStats(2)
    val (_, dup5) = gramStats(5)

    new GenericArrayData(Array[Any](
      nLines, nDupLines, dupLineChars, lineChars,
      top2, dup5, nTok.toLong, tokenChars))
  }

  /** The six Gopher gate rules over ONE profile walk, returned as a
    * single boolean — the FILTER-SAFE form of the gate. A filter
    * expressed over `repetition_profile(text)` extracts is rewritten
    * by predicate pushdown into a condition that references the
    * profile call once PER RULE OPERAND (up to eight kernel walks per
    * row — the r15 GateMicroProbe measured the pushed-down gate at
    * 16.4 s vs 0.37 s for the plain profile pass at the 10x corpus);
    * this entry point keeps the walk-once property no matter where
    * the optimizer moves the predicate. Rule arithmetic mirrors
    * [[graft.operators.Curation.gopherGate]] exactly — exact-integer
    * cross-multiplications, no float division.
    */
  def gopherKeep(s: UTF8String, minTokens: Long, maxTokens: Long): Boolean = {
    val p = repetitionProfile(s)
    val nLines = p.getLong(0)
    val nDupLines = p.getLong(1)
    val dupLineChars = p.getLong(2)
    val lineChars = p.getLong(3)
    val top2 = p.getLong(4)
    val dup5 = p.getLong(5)
    val nTokens = p.getLong(6)
    val tokenChars = p.getLong(7)
    nTokens >= minTokens && nTokens <= maxTokens &&
      tokenChars >= nTokens * 3 && tokenChars <= nTokens * 10 &&
      nDupLines * 10 <= nLines * 3 &&
      dupLineChars * 5 <= lineChars &&
      top2 * 5 <= tokenChars &&
      dup5 * 20 <= tokenChars * 3
  }
}

/** `repetition_profile(text)`: the 8 Gopher repetition counts in one
  * byte walk — see [[RepetitionKernel]] for the layout.
  */
case class RepetitionProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"repetition_profile needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    RepetitionKernel.repetitionProfile(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionKernel.repetitionProfile($c)")
  override protected def withNewChildInternal(c: Expression): RepetitionProfile = copy(c)
}

/** `gopher_keep(text, min, max)`: the six-rule Gopher gate as ONE
  * boolean from ONE kernel walk — see [[RepetitionKernel.gopherKeep]]
  * for why a filter must use this and not profile extracts.
  */
case class GopherKeep(child: Expression, minTokens: Long, maxTokens: Long)
    extends UnaryExpression {
  require(minTokens <= maxTokens,
    s"minTokens $minTokens > maxTokens $maxTokens")
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"gopher_keep needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    RepetitionKernel.gopherKeep(v.asInstanceOf[UTF8String], minTokens, maxTokens)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RepetitionKernel.gopherKeep($c, ${minTokens}L, ${maxTokens}L)")
  override protected def withNewChildInternal(c: Expression): GopherKeep =
    copy(child = c)
}

object RepetitionFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def repetition_profile(c: Column): Column = column(RepetitionProfile(expression(c)))
  def gopher_keep(c: Column, minTokens: Long = 50,
      maxTokens: Long = 100000): Column =
    column(GopherKeep(expression(c), minTokens, maxTokens))
}
