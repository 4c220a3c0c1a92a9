package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series downsampling: resample an event stream onto a fixed
  * bucket grid with OHLC-style per-bucket summaries (first / max /
  * min / last value, count, sum) — the "bars" step of telemetry or
  * market-data pipelines, and the batch shape of a monitoring
  * roll-up.
  *
  * Determinism: open/close are the values at the (time, id)-least/
  * -greatest row of each bucket — the total (time asc, id asc) order
  * expressed as a struct MIN/MAX, which aggregates with map-side
  * partials (no window over corpus-sized partitions, no row_number).
  * Money-ish values quantize to exact cents before min/max/sum, so
  * every output is engine- and order-independent.
  *
  * Scale shape: ONE shuffle on (keys, bucket); all six summaries are
  * partial-aggregable and combine map-side, so what crosses the wire
  * is one row per (key, bucket) per map task regardless of bucket
  * population — the same discipline as the exact dedup/agg family.
  */
object TimeSeries {

  /** Exact-cents quantization (2-decimal money contract, like
    * Tables.cents — duplicated here so operators stay decoupled from
    * the test fixtures).
    */
  private[operators] def cents(c: Column): Column = round(c * 100).cast("long")

  /** The six OHLC aggregate expressions over a (timeOrder, id, value)
    * total order — shared by [[resampleOhlc]] and the streaming twin
    * [[graft.streaming.EventsStream.ohlcAgg]], so the two cannot
    * drift (tie order, cents grid, and finish all live here once).
    */
  private[graft] def ohlcAggs(timeOrder: Column, id: Column,
      value: Column): Seq[Column] = {
    val vc = cents(value)
    Seq(
      min(struct(timeOrder.as("t"), id.as("i"), vc.as("v")))
        .getField("v").as("__open_c"),
      max(vc).as("__high_c"),
      min(vc).as("__low_c"),
      max(struct(timeOrder.as("t"), id.as("i"), vc.as("v")))
        .getField("v").as("__close_c"),
      count(lit(1)).as("n"),
      sum(vc).as("__vol_c"))
  }

  /** The cents-to-double finish for [[ohlcAggs]] output columns. */
  private[graft] def ohlcFinish: Seq[Column] = Seq(
    (col("__open_c").cast("double") / 100).as("open"),
    (col("__high_c").cast("double") / 100).as("high"),
    (col("__low_c").cast("double") / 100).as("low"),
    (col("__close_c").cast("double") / 100).as("close"),
    col("n"),
    (col("__vol_c").cast("double") / 100).as("volume"))

  /** One row per (keyCols, bucket_ts): open/high/low/close/n/volume.
    * `tsCol` must be LONG epoch-nanos (the Tables.events contract);
    * `bucketNs` is the grid width in nanos and must be a whole number
    * of seconds, because `bucket_ts` labels the bucket's start in
    * epoch SECONDS (a sub-second grid would alias distinct buckets
    * onto one label — rejected loudly instead). Bucket assignment
    * FLOORS for negative timestamps too (`pmod`, not `%`), matching
    * the streaming twin's `window()` semantics for pre-epoch data.
    */
  def resampleOhlc(events: DataFrame, bucketNs: Long, keyCols: Seq[String],
      tsCol: String = "ts", valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    require(bucketNs > 0, s"bucketNs $bucketNs must be positive")
    require(bucketNs % 1000000000L == 0,
      s"bucketNs $bucketNs must be a whole number of seconds: bucket_ts " +
        "labels bucket starts in epoch seconds, and a finer grid would " +
        "collapse distinct buckets onto one label")
    // integer arithmetic only: epoch-nanos exceed 2^53, a double
    // division would corrupt the bucket (the Tables.events lesson);
    // pmod (not %) so pre-epoch timestamps floor to their true bucket
    val bucket =
      expr(s"(`$tsCol` - pmod(`$tsCol`, $bucketNs)) div 1000000000")
        .as("bucket_ts")
    val aggs = ohlcAggs(col(tsCol), col(idCol), col(valueCol))
    events
      .groupBy(keyCols.map(col) :+ (bucket: Column): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keyCols.map(col) ++ (col("bucket_ts") +: ohlcFinish): _*)
      .orderBy(keyCols.map(col(_).asc) :+ col("bucket_ts").asc: _*)
  }
}
