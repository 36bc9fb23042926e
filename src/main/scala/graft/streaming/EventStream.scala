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

  /** Stream-stream interval join: each left row paired with the right
    * rows of the same key whose timestamp falls in
    * `[leftTs - interval, leftTs]`. On streams BOTH sides must carry
    * watermarks and the time-range condition is what bounds state: a
    * buffered right row older than the left watermark minus the interval
    * can never join again and is evicted — without the range bound,
    * stream-stream join state grows with the stream. On batch frames the
    * watermarks are no-ops and Catalyst plans an equality join on the key
    * with the range as a join-side filter — one shuffle per side, no
    * cross-key pair explosion.
    *
    * Column names must be disjoint across the two sides (rename before
    * calling), the usual stream-stream join contract.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String,
      intervalSql: String, joinType: String = "inner"): DataFrame =
    left.join(right,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $intervalSql") &&
        col(rightTs) <= col(leftTs),
      joinType)

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

  /** One open session interval carried across micro-batches by
    * [[sessionizeStream]].
    */
  final case class OpenSession(user_id: Long, startMicros: Long,
      lastMicros: Long, n_events: Long, total_cents: Long)

  /** The full per-user state: ALL open sessions, kept disjoint (pairwise
    * gaps strictly over the gap) and sorted by start. More than one
    * session can be open at a time: an admitted late event earlier than
    * `newest.start - gap` starts/extends an EARLIER run that must stay
    * open until the watermark passes its end + gap — emitting it
    * immediately would split two late events that belong to one session
    * (the batch twin merges them).
    */
  final case class OpenSessions(sessions: Seq[OpenSession])

  /** Stream-side event row: keeps the TIMESTAMP column itself (the
    * watermark is tracked on it — projecting it away before the stateful
    * operator makes event-time timeout unusable).
    */
  final case class StreamEvent(user_id: Long, ts: java.sql.Timestamp,
      value: Double) {
    def tsMicros: Long =
      ts.toInstant.getEpochSecond * 1000000L + ts.toInstant.getNano / 1000L
  }

  /** STREAMING sessionization with explicit custom state: ALL open
    * sessions live in `GroupState` across micro-batches and are emitted
    * once the watermark passes their last event + gap (data path or
    * event-time timeout) — the full flatMapGroupsWithState lifecycle the
    * built-in session_window implements internally, exposed for session
    * logic the built-in can't express. Late events beyond the watermark
    * are dropped by the watermark itself.
    *
    * Each admitted event is folded in as a width-0 interval and the
    * combined interval set is re-merged (runs joined when the gap
    * between them is ≤ gap, the session_window rule), so two admitted
    * late events that belong to one session merge — within one
    * micro-batch or across several — exactly as the batch twin
    * [[sessionize]] and `session_window` merge them. A session is only
    * finalized when `last + gap ≤ watermark`: any future ADMITTED event
    * has `ts ≥ watermark`, so nothing can still merge with it from
    * either side.
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
            state: GroupState[OpenSessions]) =>
          // Timeout and data invocations share one body: merge whatever
          // arrived (nothing, on timeout) into the open-session set, then
          // finalize every session the watermark has passed.
          val existing = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val units = existing ++ rows.map(e =>
            OpenSession(uid, e.tsMicros, e.tsMicros, 1L, cents(e.value)))
          val merged = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
          units.sortBy(s => (s.startMicros, s.lastMicros)).foreach { s =>
            // ≤ gap merges (strict > splits) — the session_window rule;
            // an event INSIDE an open interval has start ≤ prev.last and
            // merges too (max() keeps the wider end).
            if (merged.nonEmpty &&
                s.startMicros - merged.last.lastMicros <= gapMicros) {
              val p = merged.remove(merged.length - 1)
              merged += OpenSession(uid, p.startMicros,
                math.max(p.lastMicros, s.lastMicros),
                p.n_events + s.n_events, p.total_cents + s.total_cents)
            } else merged += s
          }
          val wmMicros = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) =
            merged.partition(_.lastMicros + gapMicros <= wmMicros)
          if (open.isEmpty) state.remove()
          else {
            state.update(OpenSessions(open.toSeq))
            // earliest pending close; clamped above the watermark (an
            // open session satisfies last+gap > wm in micros, but ms
            // truncation could land exactly ON it, which Spark rejects)
            state.setTimeoutTimestamp(math.max(
              open.map(_.lastMicros).min / 1000L + gapMinutes * 60L * 1000L,
              state.getCurrentWatermarkMs() + 1L))
          }
          closed.iterator.map(s =>
            Session(s.user_id, s.startMicros, s.n_events, s.total_cents))
      }(Encoders.product[OpenSessions], Encoders.product[Session])
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
