package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-streaming operators over the events table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch-only; these extend the engine to the
  * streaming half a production corpus pipeline needs. Every operator
  * is expressed once over a DataFrame and works identically for
  * `read` and `readStream` inputs (the batch tests in
  * StreamingSuite exploit exactly that).
  */
object EventsStream {

  /** The events stream from a parquet directory (file-stream sources
    * watch directories) with a proper timestamp column `event_time`
    * derived from `ts`, which has shipped both as long epoch-nanos
    * and as timestamp[us]/NTZ (see Tables.events) — branch on dtype.
    */
  def readEvents(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsDir).schema
    val eventTime = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(ts div 1000)")
      case _ =>
        // tz-free NTZ -> instant: the NTZ wall-clock is UTC by
        // convention (Tables.events), so derive epoch-micros with
        // pure wall-clock arithmetic and rebuild the timestamp from
        // them. A bare `cast(ts as timestamp)` is an NTZ->LTZ cast
        // that interprets the wall-clock in the SESSION zone — under
        // a non-UTC session every event_time would shift by the zone
        // offset vs the long-nanos layout (StreamingSuite pins the
        // two layouts equal under a non-UTC session).
        expr("timestamp_micros(timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))")
    }
    spark.readStream.schema(schema).parquet(eventsDir)
      .withColumn("event_time", eventTime)
  }

  /** Tumbling-window counts/sums per event type with a watermark for
    * state eviction. Works on both static and streaming frames.
    */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100)
          .as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Tumbling OHLC bars per event type — the streaming twin of
    * [[graft.operators.TimeSeries.resampleOhlc]] on the wall-clock
    * window grid. The six aggregate expressions are SHARED with the
    * batch operator ([[graft.operators.TimeSeries.ohlcAggs]]), so the
    * tie order, cents grid, and finishes cannot drift; struct min/max
    * merge associatively, so bars stay correct as micro-batches
    * accumulate state, and the watermark bounds that state. Works on
    * both static and streaming frames.
    *
    * Resolution note: the (time, id) total order here is over
    * `event_time`, a MICROSECOND timestamp (readEvents derives it
    * via `ts div 1000`), where the batch operator orders by the raw
    * nanos — a feed with sub-microsecond spacing inside one µs could
    * tie-break open/close differently between the twins. The events
    * contract is µs-resolution instants (Tables.events), where the
    * two orders coincide exactly (parity suite-pinned).
    */
  def ohlcAgg(events: DataFrame, windowLen: String = "15 minutes",
      watermark: String = "2 hours"): DataFrame = {
    val aggs = graft.operators.TimeSeries.ohlcAggs(
      col("event_time"), col("event_id"), col("value"))
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("window_start") +: col("event_type") +:
        graft.operators.TimeSeries.ohlcFinish: _*)
  }

  /** Streaming exact dedup by key with bounded state: duplicates
    * arriving within the watermark horizon are dropped; state for
    * older keys is evicted. The streaming twin of Dedup.dedupExact.
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  case class Event(event_id: Long, user_id: Long, event_type: String,
      value: Double, event_time_ms: Long)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class Session(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, n_events: Int, total_value: Double)

  /** Custom stateful sessionization: per-user sessions closed after
    * `gapMs` of inactivity, via flatMapGroupsWithState with an
    * EVENT-TIME timeout — when the watermark passes a user's
    * last-event-time + gap, the idle session is emitted and its state
    * removed, so the final session of a user who never returns still
    * flushes (NoTimeout would hold it until stream end). The typed-
    * state API the reference's data model has no analog for.
    *
    * `watermarkDelay` bounds both late data and state: events later
    * than the delay are dropped, and a session can time out once the
    * watermark clears its gap horizon.
    *
    * Batch execution of the same operator never fires timeouts (there
    * is no watermark), so a batch run emits only gap-CLOSED sessions —
    * the pre-existing contract MultimodalStreamingSuite pins.
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    // the watermark column rides beside the typed view (the Event
    // encoder selects fields by name); EliminateEventTimeWatermark
    // drops the node on batch inputs
    val streaming = events.isStreaming
    val withWm =
      if (streaming)
        events.withColumn("__event_time", expr("timestamp_millis(event_time_ms)"))
          .withWatermark("__event_time", watermarkDelay)
          .as[Event]
      else events
    withWm.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: the
            // session is definitively over (anything that could extend
            // it would be beyond-watermark late and dropped)
            val st = state.get
            state.remove()
            Iterator.single(Session(userId, st.start, st.last, st.n, st.total))
          } else {
            // events within a micro-batch are not ordered: sort the batch
            val sorted = rows.toSeq.sortBy(e => (e.event_time_ms, e.event_id))
            var st = state.getOption.orNull
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              if (st == null) {
                st = SessionState(e.event_time_ms, e.event_time_ms, 1, e.value)
              } else if (e.event_time_ms - st.last > gapMs) {
                closed += Session(userId, st.start, st.last, st.n, st.total)
                st = SessionState(e.event_time_ms, e.event_time_ms, 1, e.value)
              } else {
                st = SessionState(st.start, e.event_time_ms, st.n + 1,
                  st.total + e.value)
              }
            }
            if (st != null) {
              state.update(st)
              // the timeout must sit strictly above the current
              // watermark (a last+gap already behind it fires on the
              // next trigger)
              if (streaming)
                state.setTimeoutTimestamp(
                  math.max(st.last + gapMs, state.getCurrentWatermarkMs() + 1))
            } else state.remove()
            closed.result().iterator
          }
      }
  }

  /** Batch twin of [[sessionize]] (windows + session reconstruction in
    * pure relational form) used to cross-check the stateful operator.
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("event_time_ms"), col("event_id"))
    val marked = events
      .withColumn("prev_ts", lag(col("event_time_ms"), 1).over(w))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          (col("event_time_ms") - col("prev_ts")) > gapMs).cast("int"))
      .withColumn("session_idx",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("event_time_ms")).as("session_start_ms"),
        max(col("event_time_ms")).as("session_end_ms"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col("value")).as("total_value"))
      .drop("session_idx")
  }
}
