package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of q292's gaps-and-islands streaks, keyed by user:
  * maintain each user's CURRENT run of consecutive active days and their
  * best-ever run, emitting an updated (current, longest) row for every
  * user that was active in the micro-batch — the live "7-day streak!"
  * counter a product surface shows, instead of recomputing the island
  * census from history each night.
  *
  * State is three longs per user (last active epoch-day, current run,
  * best run) — `flatMapGroupsWithState` with no timeout, bounded by key
  * cardinality. Days are UTC epoch-days floored from the event
  * timestamp (the same day grid as q292's `to_date` under the session's
  * pinned UTC zone). Within a batch the group's distinct days are
  * processed in ascending order; ACROSS batches a day at or before the
  * last processed day is ignored (arrival-ordered, like RecordStream —
  * the batch twin q292 is the reconciliation path, the standard lambda
  * split).
  *
  * Works identically on a static frame (one "batch" per group), which
  * is what the equivalence spec pins against q292's window formulation.
  */
object StreakStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp)
  case class StreakState(lastDay: Long, cur: Long, best: Long)
  // as_of is a java.time.LocalDate built straight from the epoch-day:
  // unlike java.sql.Date(ms), its DateType conversion never consults the
  // driver JVM's default timezone, so the emitted day is stable even on
  // a JVM not pinned to UTC.
  case class Upd(user_id: Long, as_of: java.time.LocalDate,
      current_streak: Long, longest_streak: Long)

  private val MsPerDay = 86400000L

  /** Per-user streak updates from a (streaming or static) frame with
    * columns (user_id, ts). */
  def streaks(events: DataFrame): Dataset[Upd] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("ts")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[StreakState, Upd](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val days = it.map(e => Math.floorDiv(e.ts.getTime, MsPerDay))
            .toArray.distinct.sorted
          if (days.isEmpty) Iterator.empty
          else {
            var s = state.getOption.getOrElse(StreakState(Long.MinValue, 0L, 0L))
            days.foreach { d =>
              if (d > s.lastDay) {
                // lastDay is a real epoch-day once cur > 0, so the +1
                // below never overflows the sentinel path
                val cur = if (s.cur > 0L && d == s.lastDay + 1L) s.cur + 1L
                          else 1L
                s = StreakState(d, cur, math.max(s.best, cur))
              }
            }
            state.update(s)
            Iterator.single(Upd(key,
              java.time.LocalDate.ofEpochDay(s.lastDay), s.cur, s.best))
          }
      }
  }
}
