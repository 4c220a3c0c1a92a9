package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs.
  * Implemented as a simple binary min-heap keyed by "worst first" so
  * insertion beyond k is O(log k) with no allocation.
  */
final class TopKBuffer(val k: Int) {
  var size = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  /** true if (s1, i1) ranks WORSE than (s2, i2) under (score desc, id asc). */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) >> 1
      if (worse(scores(pos), ids(pos), scores(parent), ids(parent))) {
        swap(pos, parent); pos = parent
      } else return
    }
  }

  private def siftDown(pos0: Int): Unit = {
    var pos = pos0
    while (true) {
      val l = 2 * pos + 1
      val r = l + 1
      var worst = pos
      if (l < size && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < size && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == pos) return
      swap(pos, worst); pos = worst
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  /** NaN scores are REJECTED at admission: a full buffer always
    * rejected NaN (`worse(NaN, …)` and `… worse(…, NaN)` are both
    * false under IEEE comparison), but a NaN admitted while the buffer
    * was still FILLING could sit at the heap root and, never being
    * "worse" than any candidate, freeze the buffer — every later row,
    * however good, was rejected by both the eager eviction test and
    * the aggregate's lazy score gate. Rejecting NaN uniformly (treat a
    * NaN score like a null score: the row does not participate) makes
    * the filling and full phases consistent and removes the frozen
    * heap. Note this is a deliberate divergence from Spark/DuckDB ORDER
    * BY semantics, where NaN sorts LARGEST — but that ordering was
    * never implemented here (the full-buffer path always dropped NaN),
    * and the aggregate's contract is top-k by a real-valued score.
    */
  def insert(score: Double, id: Long): Unit = {
    if (score.isNaN) return
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }
  }

  /** (score, id) pairs ordered best-first. NaN can no longer enter the
    * buffer (rejected at [[insert]]), but the comparator stays a total
    * order under NaN anyway (NaN would sort last; ±0.0 stay one
    * equivalence class under the id tiebreak) — a naive
    * `s1 > s2 || (s1 == s2 && ...)` is inconsistent under NaN and
    * makes TimSort throw, and a defensive sort costs nothing here.
    */
  def sortedPairs: Array[(Double, Long)] = {
    val out = (0 until size).map(i => (scores(i), ids(i))).toArray
    out.sortWith { case ((s1, i1), (s2, i2)) =>
      if (s1 > s2) true
      else if (s2 > s1) false
      else if (s1 == s2) i1 < i2
      else if (s1.isNaN) s2.isNaN && i1 < i2
      else true // s1 real, s2 NaN
    }
  }
}

/** `top_k(score, id, k)`: per-group top-k rows by (score desc, id asc)
  * as `array<struct<score:double, id:bigint>>`, best-first.
  *
  * The point versus `row_number().over(window) <= k`: a window sorts
  * and shuffles EVERY row of every group; this aggregate keeps a
  * bounded k-heap per group and participates in partial aggregation,
  * so each map task ships at most k rows per group across the
  * shuffle. At 1000 executors x billions of scored candidates that is
  * the difference between shuffling the corpus and shuffling k rows
  * per (group x partition).
  */
case class TopKByScore(
    scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "top_k needs k > 0")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    if (s != null) {
      val sd = s.asInstanceOf[Double]
      // lazy id: once the buffer is full, a row losing on score alone
      // cannot enter regardless of its id — skip evaluating idExpr.
      // Score ties still evaluate (the id is the tiebreak). A NaN
      // score passes the filling-phase gate but insert() rejects it
      // (see TopKBuffer.insert); a full buffer's gate rejects it here
      // (NaN >= real is false) — either way the row never enters.
      if (buf.size < buf.k || sd >= buf.scores(0)) {
        val i = idExpr.eval(input)
        if (i != null) buf.insert(sd, i.asInstanceOf[Number].longValue())
      }
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sortedPairs.map { case (s, i) =>
      InternalRow(s, i): Any
    }
    new GenericArrayData(rows): ArrayData
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = c(0), idExpr = c(1))
  override def prettyName: String = "top_k"
}

/** Bounded top-k buffer over (score desc, tag asc) where the tag is a
  * string — the string-payload sibling of [[TopKBuffer]] for ranked
  * outputs whose tiebreak/identity is textual (e.g. TREC document
  * titles). Tag comparison is UTF8String binary order, which equals
  * code-point order and matches DuckDB's default collation on ASCII.
  */
final class TopKTagBuffer(val k: Int) {
  var size = 0
  val scores = new Array[Double](k)
  val tags = new Array[UTF8String](k)

  @inline private def worse(s1: Double, t1: UTF8String,
      s2: Double, t2: UTF8String): Boolean =
    s1 < s2 || (s1 == s2 && t1.compareTo(t2) > 0)

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) >> 1
      if (worse(scores(pos), tags(pos), scores(parent), tags(parent))) {
        swap(pos, parent); pos = parent
      } else return
    }
  }

  private def siftDown(pos0: Int): Unit = {
    var pos = pos0
    while (true) {
      val l = 2 * pos + 1
      val r = l + 1
      var worst = pos
      if (l < size && worse(scores(l), tags(l), scores(worst), tags(worst))) worst = l
      if (r < size && worse(scores(r), tags(r), scores(worst), tags(worst))) worst = r
      if (worst == pos) return
      swap(pos, worst); pos = worst
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val tt = tags(a); tags(a) = tags(b); tags(b) = tt
  }

  /** `tag` must be OWNED by the buffer (clone row-backed values before
    * inserting — update() does). NaN scores are rejected at admission,
    * same rationale as [[TopKBuffer.insert]]: a NaN admitted while
    * filling froze the heap.
    */
  def insert(score: Double, tag: UTF8String): Unit = {
    if (score.isNaN) return
    if (size < k) {
      scores(size) = score; tags(size) = tag; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), tags(0), score, tag)) {
      scores(0) = score; tags(0) = tag
      siftDown(0)
    }
  }

  /** (score, tag) pairs ordered best-first — total order under NaN
    * scores, same contract as [[TopKBuffer.sortedPairs]].
    */
  def sortedPairs: Array[(Double, UTF8String)] = {
    val out = (0 until size).map(i => (scores(i), tags(i))).toArray
    out.sortWith { case ((s1, t1), (s2, t2)) =>
      if (s1 > s2) true
      else if (s2 > s1) false
      else if (s1 == s2) t1.compareTo(t2) < 0
      else if (s1.isNaN) s2.isNaN && t1.compareTo(t2) < 0
      else true // s1 real, s2 NaN
    }
  }
}

/** `top_k_tag(score, tag, k)`: per-group top-k rows by (score desc,
  * tag asc) as `array<struct<score:double, tag:string>>`, best-first —
  * same bounded-shuffle contract as [[TopKByScore]] (each map task
  * ships at most k rows per group), for string-keyed rankings a
  * long id cannot carry.
  */
case class TopKByScoreTag(
    scoreExpr: Expression, tagExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKTagBuffer] {

  require(k > 0, "top_k_tag needs k > 0")

  override def children: Seq[Expression] = Seq(scoreExpr, tagExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("tag", StringType))))

  override def createAggregationBuffer(): TopKTagBuffer = new TopKTagBuffer(k)

  override def update(buf: TopKTagBuffer, input: InternalRow): TopKTagBuffer = {
    val s = scoreExpr.eval(input)
    if (s != null) {
      val sd = s.asInstanceOf[Double]
      // lazy tag: once the buffer is full, a row losing on score alone
      // cannot enter regardless of its tag — skip evaluating the
      // (possibly expensive, e.g. concat_ws-packed) tag expression
      // entirely. Each group keeps k of its whole candidate set, so at
      // corpus scale nearly every row takes this rejection path. Score
      // ties still evaluate: the tag is the tiebreak. NaN scores never
      // enter: a full buffer's gate rejects them here, the filling
      // phase rejects them in insert() (see TopKTagBuffer.insert).
      if (buf.size < buf.k || sd >= buf.scores(0)) {
        val t = tagExpr.eval(input)
        // clone: the UTF8String points into a reused row buffer
        if (t != null)
          buf.insert(sd, t.asInstanceOf[UTF8String].clone())
      }
    }
    buf
  }

  override def merge(buf: TopKTagBuffer, other: TopKTagBuffer): TopKTagBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.tags(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKTagBuffer): Any = {
    val rows: Array[Any] = buf.sortedPairs.map { case (s, t) =>
      InternalRow(s, t): Any
    }
    new GenericArrayData(rows): ArrayData
  }

  override def serialize(buf: TopKTagBuffer): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buf.size) { bytes += buf.tags(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(8 + buf.size * 12 + bytes)
    bb.putInt(buf.k).putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i))
      val tb = buf.tags(i).getBytes
      bb.putInt(tb.length).put(tb)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKTagBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKTagBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val tb = new Array[Byte](bb.getInt)
      bb.get(tb)
      buf.insert(s, UTF8String.fromBytes(tb))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScoreTag =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScoreTag =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByScoreTag =
    copy(scoreExpr = c(0), tagExpr = c(1))
  override def prettyName: String = "top_k_tag"
}

object TopKFunctions {
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  /** Aggregate column: per-group top-k (score desc, id asc) pairs.
    *
    * Conditional-evaluation contract: once a group's buffer holds k
    * entries, `id` is NOT evaluated for rows whose score alone loses
    * to the current heap-min (score ties still evaluate — the id is
    * the tiebreak). Like Spark's own short-circuit operators, `id`
    * must therefore be pure and non-erroring on rejected rows: an id
    * expression that throws (raise_error, ANSI cast overflow) or has
    * side effects may not fire on every input row.
    */
  def top_k(score: Column, id: Column, k: Int): Column =
    column(TopKByScore(expression(score.cast("double")),
      expression(id.cast("long")), k).toAggregateExpression())

  /** Aggregate column: per-group top-k (score desc, tag asc) pairs,
    * tag a string. Same conditional-evaluation contract as [[top_k]]:
    * `tag` is skipped on score-rejected rows once the buffer is full,
    * so it must be pure and non-erroring on rejected rows.
    */
  def top_k_tag(score: Column, tag: Column, k: Int): Column =
    column(TopKByScoreTag(expression(score.cast("double")),
      expression(tag.cast("string")), k).toAggregateExpression())
}
