package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q253's c-chart: per event-time DAY, the count of
  * monitored events judged against FROZEN Shewhart limits c̄ ± 3√c̄
  * (center computed batch-side from an in-control baseline period, the
  * SPC discipline — limits must not chase the data they police), with
  * the verdict emitted EXACTLY ONCE when the watermark closes the day.
  * The alerting half of the SPC pair: the batch chart (q253)
  * adjudicates history; this raises the out-of-control flag within a
  * watermark delay of the day ending.
  *
  * Emission uses [[GroupStateTimeout.EventTimeTimeout]] — the
  * DriftStream close-of-window contract — because the verdict is a
  * function of the FINISHED daily count, not a running aggregate Spark
  * could emit incrementally.
  *
  * Scale shape: state is ONE long per open day; the watermark bounds
  * open days, so state is O(open windows), independent of stream
  * length. Within a batch Spark pre-aggregates rows per key before the
  * state lookup.
  */
object SpcStream {

  // `ts` survives the projection: event-time timeout requires the
  // watermarked column in the stateful operator's input
  final case class CountRow(ts: java.sql.Timestamp, day_start_s: Long)
  final case class DayState(n: Long)
  final case class SpcPoint(day_start_s: Long, n_events: Long,
      center: Double, ucl: Double, lcl: Double, out_of_control: Boolean)

  /** Shewhart c-chart limits for a frozen center: (UCL, LCL) =
    * c̄ ± 3√c̄ with the LCL clamped at 0 (q253's convention). */
  def limitsOf(cBar: Double): (Double, Double) =
    (cBar + 3.0 * math.sqrt(cBar), math.max(0.0, cBar - 3.0 * math.sqrt(cBar)))

  /** One SpcPoint per event-time day over a WATERMARKED streaming frame
    * with a timestamp column `ts` (pre-filtered to the monitored event
    * type). `cBar` is the frozen baseline mean daily count. */
  def pointsPerDay(events: DataFrame, cBar: Double): Dataset[SpcPoint] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (ucl, lcl) = limitsOf(cBar)
    events
      .select(col("ts"),
        (floor(unix_micros(col("ts")) / 86400000000L) * 86400L)
          .as("day_start_s"))
      .as[CountRow]
      .groupByKey(_.day_start_s)
      .flatMapGroupsWithState[DayState, SpcPoint](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (day, rows, state: GroupState[DayState]) =>
          if (state.hasTimedOut) {
            val n = state.getOption.map(_.n).getOrElse(0L)
            state.remove()
            Iterator.single(SpcPoint(day, n, cBar, ucl, lcl,
              n.toDouble > ucl || n.toDouble < lcl))
          } else {
            val n = state.getOption.map(_.n).getOrElse(0L) + rows.size
            state.update(DayState(n))
            // fire when the watermark passes the end of this day
            state.setTimeoutTimestamp((day + 86400L) * 1000L)
            Iterator.empty
          }
      }
  }
}
