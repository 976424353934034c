package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q187's PSI drift gate: per event-time hour, the
  * population-stability index of the hour's bucket distribution against
  * a frozen reference, emitted EXACTLY ONCE when the watermark closes
  * the hour. The monitoring stream a feature pipeline runs beside its
  * batch drift audits — the batch gate (q187) adjudicates yesterday;
  * this raises the flag within a watermark delay of the drift.
  *
  * Emission is driven by [[GroupStateTimeout.EventTimeTimeout]]: state
  * (one small count array per OPEN hour) accumulates across
  * micro-batches and the PSI row fires on the timeout callback after
  * the watermark passes the hour end — the same
  * close-of-window-exactly-once contract as OhlcStream's bars, but
  * through explicit state because PSI is a FUNCTION OF the finished
  * histogram, not a running aggregate Spark could emit incrementally.
  *
  * Scale shape: state is `nBuckets` longs per open hour per key-group;
  * within a batch Spark pre-groups rows by key before the state
  * lookup. Watermark bounds open hours, so state is
  * O(open windows · buckets), independent of stream length.
  */
object DriftStream {

  // carries `ts` through the projection: the watermark is attached to
  // the event-time COLUMN, and event-time timeout requires that column
  // to survive into the stateful operator's input
  final case class BucketRow(ts: java.sql.Timestamp, hour_start_s: Long,
      bucket: Int)
  final case class HourState(counts: Map[Int, Long])
  final case class Psi(hour_start_s: Long, n_events: Long, psi: Double)

  /** Smoothed PSI of observed bucket counts vs reference probabilities:
    * Σ_b (p_b − q_b)·ln(p_b/q_b) with ε-floored shares (q187's
    * convention, so empty buckets stay finite). */
  def psiOf(counts: Map[Int, Long], refProbs: Map[Int, Double],
      nBuckets: Int): (Long, Double) = {
    val eps = 1e-6
    val n = counts.values.sum
    val psi = (0 until nBuckets).map { b =>
      val p = math.max(counts.getOrElse(b, 0L).toDouble /
        math.max(n, 1L).toDouble, eps)
      val q = math.max(refProbs.getOrElse(b, 0.0), eps)
      (p - q) * math.log(p / q)
    }.sum
    (n, psi)
  }

  /** PSI per event-time hour over a WATERMARKED streaming frame with
    * columns (ts: timestamp, bucket: int). `refProbs` is the frozen
    * reference bucket distribution (computed batch-side, e.g. from last
    * month); one Psi row per hour, on watermark close. */
  def psiPerHour(bucketed: DataFrame, refProbs: Map[Int, Double],
      nBuckets: Int = 10): Dataset[Psi] = {
    val spark = bucketed.sparkSession
    import spark.implicits._
    bucketed
      .select(col("ts"),
        (floor(unix_micros(col("ts")) / 3600000000L) * 3600L)
          .as("hour_start_s"), col("bucket").cast("int").as("bucket"))
      .as[BucketRow]
      .groupByKey(_.hour_start_s)
      .flatMapGroupsWithState[HourState, Psi](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (hour, rows, state: GroupState[HourState]) =>
          if (state.hasTimedOut) {
            val (n, psi) = psiOf(
              state.getOption.map(_.counts).getOrElse(Map.empty),
              refProbs, nBuckets)
            state.remove()
            Iterator.single(Psi(hour, n, psi))
          } else {
            val prev = state.getOption.map(_.counts).getOrElse(Map.empty)
            val merged = rows.foldLeft(prev) { (m, r) =>
              m.updated(r.bucket, m.getOrElse(r.bucket, 0L) + 1L)
            }
            state.update(HourState(merged))
            // fire when the watermark passes the end of this hour
            state.setTimeoutTimestamp((hour + 3600L) * 1000L)
            Iterator.empty
          }
      }
  }
}
