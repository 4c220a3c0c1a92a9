package graft.selectivesearch

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-Aggregator form of P@k (the alternative to the window-filter
  * form in [[SelectiveSearch.Measure]]): consumes (global_rank, rel)
  * pairs in ANY order, keeps the k smallest global_ranks in a bounded
  * array buffer, and averages their relevance. Order-insensitivity is
  * what makes it safe under merge — partial buffers combine
  * associatively, so it participates in map-side partial aggregation
  * like any built-in (the reference's closure-over-sorted-rows
  * measure (dataproc/measures.py:3-5) has no such decomposition).
  */
object Measures {

  /** Bounded "k smallest global_ranks" buffer: parallel arrays sorted
    * ascending by rank; insertion shifts — k is small (10-100).
    */
  case class PAtBuffer(ranks: Array[Int], rels: Array[Double], var size: Int)

  class PrecisionAtAggregator(k: Int)
      extends Aggregator[(Int, Double), PAtBuffer, Double] {

    override def zero: PAtBuffer =
      PAtBuffer(new Array[Int](k), new Array[Double](k), 0)

    private def insert(b: PAtBuffer, rank: Int, rel: Double): PAtBuffer = {
      if (b.size < k || rank < b.ranks(b.size - 1)) {
        var pos = math.min(b.size, k - 1)
        // shift larger ranks right, dropping the overflow
        while (pos > 0 && b.ranks(pos - 1) > rank) {
          b.ranks(pos) = b.ranks(pos - 1)
          b.rels(pos) = b.rels(pos - 1)
          pos -= 1
        }
        b.ranks(pos) = rank
        b.rels(pos) = rel
        if (b.size < k) b.size += 1
      }
      b
    }

    override def reduce(b: PAtBuffer, in: (Int, Double)): PAtBuffer =
      insert(b, in._1, in._2)

    override def merge(a: PAtBuffer, b: PAtBuffer): PAtBuffer = {
      var i = 0
      var acc = a
      while (i < b.size) { acc = insert(acc, b.ranks(i), b.rels(i)); i += 1 }
      acc
    }

    override def finish(b: PAtBuffer): Double =
      if (b.size == 0) Double.NaN
      else {
        var s = 0.0
        var i = 0
        while (i < b.size) { s += b.rels(i); i += 1 }
        s / b.size
      }

    override def bufferEncoder: Encoder[PAtBuffer] = Encoders.product[PAtBuffer]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** P@k as a TypedColumn over (global_rank, rel) tuples. */
  def precisionAtTyped(k: Int): TypedColumn[(Int, Double), Double] =
    new PrecisionAtAggregator(k).toColumn.name(s"p_$k")
}
