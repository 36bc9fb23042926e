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
}
