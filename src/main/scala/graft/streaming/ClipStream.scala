package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Live user-contribution clipping gate — the streaming twin of q405's
  * batch audit: a user-level-DP intake enforces the contribution bound
  * AS EVENTS ARRIVE, admitting at most `bound` events per (user, day)
  * cell, instead of clipping retrospectively. Keyed state is ONE
  * counter per (user, day) (`flatMapGroupsWithState`, the
  * HeavyHitterStream discipline).
  *
  * The emitted unit is a per-(key, micro-batch) admission LEDGER row —
  * not per-event verdicts — because arrival order inside a micro-batch
  * is not deterministic, while the admitted COUNT is: whatever the
  * order, a batch of n events against a cell that has already seen s
  * admits exactly min(max(bound − s, 0), n). That makes the ledger
  * batch-split-invariant (proved in spec) and its admitted column sum
  * to EXACTLY the batch audit's kept_events at the same bound — the
  * stream and q405 agree to the integer.
  *
  * State eviction: keys are (user, active-day) pairs, so live state is
  * bounded by users × the handful of days still inside the lateness
  * horizon — production attaches a processing-time timeout (a day's
  * key goes cold after the watermark passes midnight); the fixture
  * replay keeps NoTimeout so totals stay exact for the agreement
  * proof. */
object ClipStream {

  final case class ClipState(seen: Long)
  final case class Admission(user_id: Long, day: String,
      batch_events: Long, admitted: Long, dropped: Long, seen_total: Long)

  /** Admission ledger over a streaming frame with `user_id` and `day`
    * columns: one row per (user, day, micro-batch) with the exact
    * admitted/dropped split under the contribution bound. */
  def admissions(events: DataFrame, bound: Long): Dataset[Admission] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(bound > 0, s"contribution bound must be positive: $bound")
    events.select(col("user_id").cast("long"), col("day").cast("string"))
      .as[(Long, String)]
      .groupByKey(identity)
      .flatMapGroupsWithState[ClipState, Admission](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((user, day), rows, state) =>
          val prev = state.getOption.map(_.seen).getOrElse(0L)
          val n = rows.size.toLong
          val admitted = math.min(math.max(bound - prev, 0L), n)
          state.update(ClipState(prev + n))
          Iterator.single(Admission(user, day, n, admitted, n - admitted,
            prev + n))
      }
  }
}
