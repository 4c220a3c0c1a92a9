package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text-profile kernel.
  *
  * The declarative language-ID / quality-score expressions embedded
  * one `split(btrim(text), "\\s+")` per stopword list: the `filter`
  * higher-order functions are CodegenFallback, so common-subexpression
  * elimination never collapsed them — the lang_id physical plan
  * carried 24 independent `split(` subtrees (probe-measured), i.e.
  * ~24 regex tokenizations of every document. Same trap, same cure as
  * [[ShingleKernels]]: ONE byte walk per document computes every count
  * the text-analysis surface needs, inside whole-stage codegen.
  *
  * Tokenization is bit-identical to `split(btrim(text), "\\s+")`:
  * btrim strips ASCII spaces (0x20) only; tokens split on maximal runs
  * of Java-regex `\s` = [ \t\n\x0B\f\r] (UTF-8 multibyte units are all
  * >= 0x80, so the ASCII byte walk is exact for any Unicode text);
  * leading/trailing runs contribute empty tokens exactly as
  * `Pattern.split` with limit -1 does. Pinned against the retained
  * declarative forms by randomized ScalaCheck properties.
  *
  * Profile layout (array<int>):
  *   [0] n_tokens  — `tokenCount` semantics (0 for blank text)
  *   [1..4]        — stopword hits for en, es, fr, de
  *                   ([[TextFunctions.stopwords]] order; the DuckDB
  *                   oracle SQL is generated from the same constants)
  *   [5] n_punct   — chars not in [A-Za-z0-9 ] over the RAW text
  *   [6] n_chars   — code-point length of the raw text
  */
object TextProfileKernel {

  private val NumLangs = TextFunctions.stopwords.length

  /** Stopword byte images, [lang][word][byte] — built once from the
    * same constants the oracle SQL generator reads.
    */
  private val langWords: Array[Array[Array[Byte]]] =
    TextFunctions.stopwords.map { case (_, ws) =>
      ws.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
    }.toArray

  private val langNames: Array[UTF8String] =
    TextFunctions.stopwords.map { case (l, _) => UTF8String.fromString(l) }.toArray
  private val Und = UTF8String.fromString("und")

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** One walk; hits(0..NumLangs-1) filled, returns the guarded token
    * count (the split-array size, 0 when the trimmed text is empty).
    */
  private def walkTokens(bytes: Array[Byte], hits: Array[Int]): Int = {
    var lo = 0
    var hi = bytes.length
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    if (hi == lo) return 0
    var sepRuns = 0
    var inSep = false
    var start = lo
    var i = lo
    while (i < hi) {
      if (isWs(bytes(i))) {
        if (!inSep) {
          if (i > start) matchToken(bytes, start, i, hits)
          sepRuns += 1
          inSep = true
        }
      } else if (inSep) {
        inSep = false
        start = i
      }
      i += 1
    }
    if (!inSep && hi > start) matchToken(bytes, start, hi, hits)
    sepRuns + 1
  }

  private def matchToken(bytes: Array[Byte], from: Int, until: Int,
      hits: Array[Int]): Unit = {
    val len = until - from
    var li = 0
    while (li < NumLangs) {
      val words = langWords(li)
      var wi = 0
      var found = false
      while (wi < words.length && !found) {
        val w = words(wi)
        if (w.length == len) {
          var j = 0
          while (j < len && bytes(from + j) == w(j)) j += 1
          if (j == len) { hits(li) += 1; found = true }
        }
        wi += 1
      }
      li += 1
    }
  }

  /** chars NOT in [A-Za-z0-9 ]: code-point count minus matching bytes
    * (every char of the class is a single UTF-8 byte).
    */
  private def punctCount(s: UTF8String, bytes: Array[Byte]): Int = {
    var kept = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
          (b >= '0' && b <= '9') || b == ' ') kept += 1
      i += 1
    }
    s.numChars() - kept
  }

  def textProfile(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val hits = new Array[Int](NumLangs)
    val nTok = walkTokens(bytes, hits)
    val out = new Array[Any](NumLangs + 3)
    out(0) = nTok
    var i = 0
    while (i < NumLangs) { out(i + 1) = hits(i); i += 1 }
    out(NumLangs + 1) = punctCount(s, bytes)
    out(NumLangs + 2) = s.numChars()
    new GenericArrayData(out)
  }

  /** Argmax of per-language stopword hits, ties in list order
    * (en > es > fr > de); "und" when no list scores a hit — identical
    * to [[TextFunctions.langIdDeclarative]].
    */
  def langId(s: UTF8String): UTF8String = {
    val hits = new Array[Int](NumLangs)
    walkTokens(s.getBytes, hits)
    var best = 0
    var i = 0
    while (i < NumLangs) { if (hits(i) > best) best = hits(i); i += 1 }
    if (best <= 0) return Und
    i = 0
    while (i < NumLangs) { if (hits(i) == best) return langNames(i); i += 1 }
    Und
  }

  /** stopRatio - punctRatio + lengthTerm with the exact double-op
    * order of [[TextFunctions.qualityScoreDeclarative]] (and the
    * generated oracle SQL), so results hash-match bit-for-bit.
    */
  def qualityScore(s: UTF8String): Double = {
    val bytes = s.getBytes
    val hits = new Array[Int](NumLangs)
    val nTok = walkTokens(bytes, hits)
    val nChars = s.numChars()
    val nPunct = punctCount(s, bytes)
    val stopRatio = if (nTok == 0) 0.0 else hits(0).toDouble / nTok
    val punctRatio = if (nChars == 0) 0.0 else nPunct.toDouble / nChars
    val lengthTerm = math.min(nTok.toDouble / 100.0, 1.0)
    stopRatio - punctRatio + lengthTerm
  }
}

/** `text_profile(text)`: [n_tokens, en, es, fr, de, n_punct, n_chars]
  * in one byte walk — the composable form.
  */
case class TextProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"text_profile needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    TextProfileKernel.textProfile(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextProfileKernel.textProfile($c)")
  override protected def withNewChildInternal(c: Expression): TextProfile = copy(c)
}

/** `lang_id(text)`: n-gram-heuristic language ID, one byte walk. */
case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"lang_id needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    TextProfileKernel.langId(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextProfileKernel.langId($c)")
  override protected def withNewChildInternal(c: Expression): LangId = copy(c)
}

/** `quality_score(text)`: heuristic document quality, one byte walk. */
case class QualityScore(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"quality_score needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    TextProfileKernel.qualityScore(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextProfileKernel.qualityScore($c)")
  override protected def withNewChildInternal(c: Expression): QualityScore = copy(c)
}

object TextProfileFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
  def text_profile(c: Column): Column = column(TextProfile(expression(c)))
  def lang_id(c: Column): Column = column(LangId(expression(c)))
  def quality_score(c: Column): Column = column(QualityScore(expression(c)))
}
