package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured-Streaming analytics over the events stream. The aggregation
  * bodies are plain functions of a DataFrame, so the SAME logic serves the
  * batch query (`q_stream_window` — Spark eliminates the watermark node on
  * batch inputs) and the incremental streaming query (`readStream` →
  * [[hourlyCounts]] → `writeStream`), which is exactly the batch/stream
  * unification Structured Streaming is designed around.
  */
object EventStream {

  private val dec = DecimalType(18, 2)
  private def dsum(c: Column): Column = sum(c.cast(dec)).cast(DoubleType)

  /** Tumbling 1-hour windows of event counts + value totals per type.
    *
    * On a stream: `withWatermark` bounds state — windows more than
    * `delayThreshold` behind the max seen event time are finalized and
    * evicted, so state size is O(active windows × types), independent of
    * stream length. On a batch frame the watermark is a no-op and this is
    * an ordinary two-phase hash aggregate.
    */
  def hourlyCounts(events: DataFrame,
      delayThreshold: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delayThreshold)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("total_value"))
      .select(col("w.start").as("hour_ts"), col("event_type"),
        col("cnt"), col("total_value"))

  /** Per-user sessionization via the built-in `session_window`: a session
    * extends while consecutive events arrive within `gap`; on a stream the
    * watermark finalizes sessions whose window closed before it. One
    * shuffle on user_id; state per OPEN session only.
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      delayThreshold: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", delayThreshold)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("total_value"))
}

/** Typed custom-state sessionization — the `flatMapGroupsWithState` API
  * surface for session logic the built-in window can't express (e.g.
  * value-dependent gaps, early emission). This implementation reproduces
  * exactly the fixed-gap semantics of [[EventStream.sessionize]], so the
  * two are interchangeable and test-checked equal.
  *
  * [[TypedSessionize.sessionize]] is the BATCH path (each group's
  * iterator is complete, state unused); [[TypedSessionize.sessionizeStream]]
  * is the streaming path, carrying the open session in `GroupState` and
  * emitting it on event-time timeout. Both share the gap semantics and
  * cent-exact sums, and [[EventStream.sessionize]] (built-in
  * session_window) is the third, equivalent formulation.
  */
object TypedSessionize {

  import org.apache.spark.sql.{Dataset, Encoders, Row, SparkSession}
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  final case class SessionEvent(user_id: Long, tsMicros: Long, value: Double)
  final case class Session(user_id: Long, startMicros: Long,
      n_events: Long, total_cents: Long)

  /** CAST(v AS DECIMAL(18,2)) in integer cents: HALF_UP on the SHORTEST
    * DECIMAL REPRESENTATION of the double (BigDecimal.valueOf), exactly
    * as Spark's decimal cast and the oracle compute it —
    * `math.round(v * 100)` would disagree on 3-decimal values like 8.845
    * (stored as 8.84499…, rounding to 884 instead of 885).
    */
  def cents(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  /** Split one user's (sorted) events into fixed-gap sessions. Value sums
    * accumulate as exact integer cents, so the result is deterministic and
    * matches the decimal-sum oracle bit-for-bit.
    */
  def sessionsOf(events: Iterator[SessionEvent],
      gapMicros: Long): Iterator[Session] = {
    val sorted = events.toIndexedSeq.sortBy(_.tsMicros)
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var start = sorted.head.tsMicros
      var last = start
      var n = 0L
      var sumCents = 0L
      sorted.foreach { e =>
        // strict >: session_window treats an exactly-gap-length pause as
        // still inside the session (windows merge when adjacent)
        if (e.tsMicros - last > gapMicros) {
          out += Session(sorted.head.user_id, start, n, sumCents)
          start = e.tsMicros; n = 0L; sumCents = 0L
        }
        last = e.tsMicros
        n += 1
        sumCents += cents(e.value)
      }
      out += Session(sorted.head.user_id, start, n, sumCents)
      out.iterator
    }
  }

  /** Open-session state carried across micro-batches by
    * [[sessionizeStream]].
    */
  final case class OpenSession(user_id: Long, startMicros: Long,
      lastMicros: Long, n_events: Long, total_cents: Long)

  /** Stream-side event row: keeps the TIMESTAMP column itself (the
    * watermark is tracked on it — projecting it away before the stateful
    * operator makes event-time timeout unusable).
    */
  final case class StreamEvent(user_id: Long, ts: java.sql.Timestamp,
      value: Double) {
    def tsMicros: Long =
      ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  }

  /** STREAMING sessionization with explicit custom state: the open
    * session lives in `GroupState` across micro-batches and is emitted
    * when the event-time timeout fires (watermark passes last-event +
    * gap) — the full flatMapGroupsWithState lifecycle the built-in
    * session_window implements internally, exposed for session logic the
    * built-in can't express. Late events beyond the watermark are
    * dropped by the watermark itself.
    */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
      gapMinutes: Int, delayThreshold: String = "2 hours"): DataFrame = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    val typed: Dataset[StreamEvent] = events
      .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
      .withWatermark("ts", delayThreshold)
      .as[StreamEvent]
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[StreamEvent],
            state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(s.user_id, s.startMicros, s.n_events,
              s.total_cents))
          } else {
            val sorted = rows.toIndexedSeq.sortBy(_.tsMicros)
            val closed =
              scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                // Merge decision is against the session INTERVAL: an
                // admitted late event inside [start-gap, last+gap] merges
                // (exactly what the globally-sorted batch twin does —
                // in-interval events are always within gap of a member),
                // extending the interval on whichever side it lands.
                // Comparing only against lastMicros would let a late
                // event REWIND lastMicros and wrongly split on the next
                // in-order event.
                case Some(s)
                    if e.tsMicros >= s.startMicros - gapMicros &&
                      e.tsMicros <= s.lastMicros + gapMicros =>
                  cur = Some(s.copy(
                    startMicros = math.min(s.startMicros, e.tsMicros),
                    lastMicros = math.max(s.lastMicros, e.tsMicros),
                    n_events = s.n_events + 1,
                    total_cents = s.total_cents + cents(e.value)))
                // gap-isolated BEFORE the open session: it can never
                // merge with anything later — emit as its own session
                case Some(s) if e.tsMicros < s.startMicros - gapMicros =>
                  closed += Session(uid, e.tsMicros, 1L, cents(e.value))
                // strictly past the gap after the session: close + open
                case Some(s) =>
                  closed += Session(s.user_id, s.startMicros, s.n_events,
                    s.total_cents)
                  cur = Some(OpenSession(uid, e.tsMicros, e.tsMicros, 1L,
                    cents(e.value)))
                case None =>
                  cur = Some(OpenSession(uid, e.tsMicros, e.tsMicros, 1L,
                    cents(e.value)))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                s.lastMicros / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.iterator
          }
      }(Encoders.product[OpenSession], Encoders.product[Session])
      .select(col("user_id"),
        expr("CAST(timestamp_micros(startMicros) AS TIMESTAMP_NTZ)")
          .as("session_start"),
        col("n_events"),
        (col("total_cents").cast("double") / 100.0).as("total_value"))
  }

  /** Batch sessionize over (user_id, ts, value): each group arrives
    * complete, so state is unused — the batch twin of
    * [[sessionizeStream]], sharing its gap semantics and cent-exact
    * sums.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMinutes: Int): DataFrame = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    val typed: Dataset[SessionEvent] = events
      .selectExpr("user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS tsMicros", "value")
      .as[SessionEvent]
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: Long, events: Iterator[SessionEvent],
            _: GroupState[Session]) =>
          sessionsOf(events, gapMicros)
      }(Encoders.product[Session], Encoders.product[Session])
      .select(col("user_id"),
        expr("CAST(timestamp_micros(startMicros) AS TIMESTAMP_NTZ)")
          .as("session_start"),
        col("n_events"),
        (col("total_cents").cast("double") / 100.0).as("total_value"))
  }
}
