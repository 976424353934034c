package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of q341's daily SRM census (VERDICT r12 #4): per
  * event-time day, the day's DISTINCT active users split by the
  * q129/q314 hash arm, judged against the exact design share with the
  * |z| > 3 SRM flag, emitted EXACTLY ONCE when the watermark closes the
  * day. The randomization guardrail of the experimentation control
  * plane as a live monitor: the batch census (q341) adjudicates
  * history; this raises the broken-randomization flag within a
  * watermark delay of the onset day ending.
  *
  * Unlike the SpcStream/DriftStream twins (one custom stateful
  * operator), this one composes Spark's own chained stateful operators
  * — [[DataFrame.dropDuplicatesWithinWatermark]] keyed on
  * (user_id, day) followed by a 1-day tumbling-window aggregate — the
  * multiple-stateful-operator pipeline Spark supports natively in
  * append mode. Nothing custom holds state, so both operators get
  * Spark's state-store management (RocksDB/HDFS backends, changelog
  * checkpointing) for free.
  *
  * Scale shape: dedup state is one entry per (day-active user) within
  * the watermark horizon — exactly the state a streaming DISTINCT
  * costs, evicted as the watermark passes; the window aggregate holds
  * two longs per open day. Day-scoping is what keeps the state bounded:
  * a CUMULATIVE streaming SRM would need the full enrollment history in
  * state forever (that form stays batch — q314). */
object SrmStream {

  /** Day-close SRM verdicts over a WATERMARKED streaming frame with
    * columns (ts: timestamp, user_id): one row per event-time day on
    * watermark close — (day_start_s, n_a, n_b, n, observed_share,
    * srm_z, srm_flag), q341's arithmetic exactly. */
  def verdictsPerDay(events: DataFrame): DataFrame = {
    val deduped = events
      .select(col("ts"), col("user_id"),
        (floor(unix_micros(col("ts")) / 86400000000L) * 86400L)
          .as("day_start_s"),
        (substring(md5(col("user_id").cast("string")), 1, 1) < "8")
          .as("is_a"))
      // one state entry per (user, day) until the watermark passes —
      // the streaming twin of q341's (day, user) DISTINCT
      .dropDuplicatesWithinWatermark("user_id", "day_start_s")
    val c = deduped
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"))
    val nD = col("n").cast("double")
    val z = (col("n_a").cast("double") - nD * lit(0.5)) /
      sqrt(nD * lit(0.5) * lit(0.5))
    // `/` is double division in Spark SQL — keep the epoch-second day
    // key integral (the micros of a day boundary divide exactly)
    c.select(floor(unix_micros(col("window.start")) / 1000000L)
        .cast("long").as("day_start_s"),
      col("n_a"), (col("n") - col("n_a")).as("n_b"), col("n"),
      (col("n_a").cast("double") / nD).as("observed_share"),
      z.as("srm_z"), (abs(z) > lit(3.0)).as("srm_flag"))
  }
}
