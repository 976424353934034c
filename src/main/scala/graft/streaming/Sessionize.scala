package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful-streaming sessionization — the `flatMapGroupsWithState` twin of
  * the batch window-function formulation in
  * [[graft.queries.SessionQueries]] (asserted equivalent in tests).
  *
  * State = at most ONE open session per user (constant size per key — the
  * 100 TB-stream requirement: state is bounded by |users|, not |events|).
  * Events arrive batched per key; each batch is sorted on (ts, event_id)
  * — Spark guarantees no cross-batch reordering per key via the shuffle,
  * and within-batch order is restored locally. A gap beyond `gapUs` closes
  * the open session (emitted downstream) and opens a new one; the open
  * session persists in state across micro-batches.
  *
  * In production the open session would also close on an event-time
  * timeout; `flushOpen` exists for batch/drain use where group input is
  * complete and the trailing open session must be emitted.
  */
object Sessionize {

  final case class Ev(user_id: Long, event_id: Long, ts_us: Long, value: Double)

  final case class OpenSession(
      startUs: Long, lastUs: Long, n: Long, totalScaled4: Long)

  final case class Session(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, total_value: Double)

  val DefaultGapUs: Long = 30L * 60 * 1000000

  /** Fold one user's (sorted) events into closed sessions + the open tail.
    * Money kept as a scaled-by-10⁴ long (events.value is ≤4 dp) so totals
    * are exact and order-independent like the batch decimal sum. */
  def foldEvents(
      uid: Long, evs: Seq[Ev], open: Option[OpenSession], gapUs: Long):
      (List[Session], Option[OpenSession]) = {
    var state = open
    val closed = List.newBuilder[Session]
    evs.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      // exactly Spark's double→DECIMAL(18,4) cast: canonical string repr,
      // then HALF_UP at scale 4 (math.round(v*1e4) differs on values whose
      // double image lands just under a .5 boundary)
      val scaled = java.math.BigDecimal.valueOf(e.value)
        .setScale(4, java.math.RoundingMode.HALF_UP)
        .movePointRight(4).longValueExact()
      state match {
        case Some(s) if e.ts_us - s.lastUs <= gapUs =>
          state = Some(OpenSession(s.startUs, e.ts_us, s.n + 1,
            s.totalScaled4 + scaled))
        case Some(s) =>
          closed += Session(uid, s.startUs, s.lastUs, s.n, s.totalScaled4 / 1e4)
          state = Some(OpenSession(e.ts_us, e.ts_us, 1, scaled))
        case None =>
          state = Some(OpenSession(e.ts_us, e.ts_us, 1, scaled))
      }
    }
    (closed.result(), state)
  }

  /** Works on a streaming Dataset (state persists across micro-batches)
    * and on a static Dataset (one complete pass per group). */
  def sessions(events: Dataset[Ev], gapUs: Long = DefaultGapUs,
               flushOpen: Boolean = false): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[OpenSession]) =>
          val (closed, open) =
            foldEvents(uid, evs.toSeq, state.getOption, gapUs)
          open match {
            case Some(s) if flushOpen =>
              state.remove()
              (closed :+ Session(uid, s.startUs, s.lastUs, s.n,
                s.totalScaled4 / 1e4)).iterator
            case Some(s) => state.update(s); closed.iterator
            case None => state.remove(); closed.iterator
          }
      }
  }
}
