package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful-streaming funnel tracking — the `flatMapGroupsWithState` twin
  * of the batch cascade in [[graft.queries.FunnelQueries]] q86 (asserted
  * equivalent in tests): per user, emit a StageHit the moment a funnel
  * stage is first cleared (view → click-strictly-after → purchase-
  * strictly-after).
  *
  * State = three timestamps per user (constant per key — the 100 TB-
  * stream requirement: state is bounded by |users|, not |events|), and
  * stage transitions are MONOTONE, so Append output mode is exact: a hit,
  * once emitted, can never be retracted. Same per-key ordering assumption
  * as [[Sessionize]]: events arrive event-time-ordered per user (each
  * batch is locally re-sorted on (ts, event_id)); under that assumption
  * the greedy first-qualifying-event choice IS the batch min-timestamp
  * cascade.
  */
object FunnelStream {

  final case class Ev(
      user_id: Long, event_id: Long, ts_us: Long, event_type: String)

  /** Stage-not-reached sentinel. Long.MinValue, NOT -1: event times are
    * microseconds since epoch and may legitimately be negative (pre-1970
    * archives); a -1 sentinel would leave stage 1 permanently "unset" for
    * such streams, re-emitting hits and breaking the q86 batch
    * equivalence. Long.MinValue is unreachable as a real timestamp
    * (−292k years, and `ts > prev` can never fire at it). */
  val Unset: Long = Long.MinValue

  /** [[Unset]] = stage not reached yet. */
  final case class FState(t1: Long, t2: Long, t3: Long)

  final case class StageHit(user_id: Long, stage: Int, ts_us: Long)

  /** Fold one user's (sorted) batch into newly-cleared stages. */
  def fold(uid: Long, evs: Seq[Ev], st0: FState):
      (List[StageHit], FState) = {
    var st = st0
    val hits = List.newBuilder[StageHit]
    evs.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      if (st.t1 == Unset && e.event_type == "view") {
        st = st.copy(t1 = e.ts_us); hits += StageHit(uid, 1, e.ts_us)
      } else if (st.t1 != Unset && st.t2 == Unset && e.event_type == "click" &&
          e.ts_us > st.t1) {
        st = st.copy(t2 = e.ts_us); hits += StageHit(uid, 2, e.ts_us)
      } else if (st.t2 != Unset && st.t3 == Unset && e.event_type == "purchase" &&
          e.ts_us > st.t2) {
        st = st.copy(t3 = e.ts_us); hits += StageHit(uid, 3, e.ts_us)
      }
    }
    (hits.result(), st)
  }

  /** Works on a streaming Dataset (state persists across micro-batches)
    * and on a static Dataset (one complete pass per group). */
  def stageHits(events: Dataset[Ev]): Dataset[StageHit] = {
    implicit val hitEnc = Encoders.product[StageHit]
    implicit val stateEnc = Encoders.product[FState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FState, StageHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[FState]) =>
          val (hits, st) = fold(uid, evs.toSeq,
            state.getOption.getOrElse(FState(Unset, Unset, Unset)))
          state.update(st)
          hits.iterator
      }
  }
}
