package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twin of q135's hourly OHLC bars: the identical
  * min_by/max_by aggregation over event-time tumbling windows, with a
  * watermark bounding state. Append mode emits each bar exactly once —
  * when the watermark passes the hour's end — which is the contract a
  * downstream bar-store wants (no in-place bar revisions to reconcile).
  *
  * Scale shape: same as the batch query — ONE two-phase aggregate with
  * map-side partials; streaming adds only the per-window state row
  * (five numbers + the two arg-extreme keys per open hour per
  * partition), aged out by the watermark.
  */
object OhlcStream {

  /** The shared bar aggregation — both the batch query and the
    * streaming twin call exactly this, so batch/stream equivalence is
    * by construction (one definition, two drivers). */
  def barAggs(ord: Column): Seq[Column] = Seq(
    min_by(col("value"), ord).as("open"),
    max(col("value")).as("high"),
    min(col("value")).as("low"),
    max_by(col("value"), ord).as("close"),
    count(lit(1)).as("n_events"))

  private def ord: Column = struct(col("ts"), col("event_id"))

  /** Hourly bars over a (possibly streaming) frame with columns
    * (ts: timestamp, event_id, value). Streaming callers must pass a
    * watermarked frame; Append emission then fires once per closed
    * hour. */
  def hourlyBars(events: DataFrame): DataFrame = {
    val aggs = barAggs(ord)
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bar_hour"),
        col("open"), col("high"), col("low"), col("close"), col("n_events"))
  }
}
