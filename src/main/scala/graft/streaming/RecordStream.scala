package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of q210's record detection, keyed by event_type: emit
  * every event whose value STRICTLY exceeds all previously processed
  * events of its type ("biggest purchase ever", "highest error count
  * ever" — the alert a monitoring stream raises the moment it happens,
  * instead of a day later from the batch history).
  *
  * State is ONE double per event_type (the running max) —
  * `flatMapGroupsWithState` with no timeout, so state is bounded by the
  * key cardinality, not the stream length. Within a micro-batch the
  * group's rows are sorted by (ts, event_id) before the scan, so a batch
  * that delivers events out of order still processes them in event-time
  * order; ACROSS batches the detector is necessarily arrival-ordered
  * (a true record that arrives after a later, larger record has been
  * processed is not re-raised — the batch twin q210 is the
  * reconciliation path, the standard lambda split).
  *
  * Works identically on a static frame (Spark runs one "batch" per
  * group), which is what the equivalence spec pins against the window
  * formulation.
  */
object RecordStream {

  case class Ev(event_type: String, ts: java.sql.Timestamp, event_id: Long,
      value: Double)
  case class Rec(event_type: String, event_id: Long,
      ts: java.sql.Timestamp, value: Double)

  /** Record events per event_type from a (streaming or static) frame
    * with columns (event_type, ts, event_id, value). */
  def records(events: DataFrame): Dataset[Rec] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .as[Ev]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[Double, Rec](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          var mx = state.getOption.getOrElse(Double.NegativeInfinity)
          val out = Seq.newBuilder[Rec]
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            if (e.value > mx) {
              mx = e.value
              out += Rec(key, e.event_id, e.ts, e.value)
            }
          }
          state.update(mx)
          out.result().iterator
      }
  }
}
