package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of q318's open-order backlog: a keyed live counter of
  * open intervals. The input is the same ±1 boundary stream the batch
  * sweep builds (+1 when an order opens, −1 the day after its last line
  * ships), keyed by a shard (nation in the spec); each micro-batch emits
  * one row per active shard with the batch's open/close flows and the
  * running backlog AFTER the batch — the "how many orders are open
  * right now, per region" number an operations dashboard polls, hours
  * ahead of the nightly q318 ledger (which remains the reconciliation
  * path, the standard lambda split).
  *
  * State is ONE long per shard (the running backlog) —
  * `flatMapGroupsWithState` with no timeout, so state is bounded by the
  * shard-key cardinality, never the stream length. Emission is
  * arrival-ordered (a counter is order-insensitive: the sum of ±1
  * deltas is the same in any order, so unlike RecordStream no in-batch
  * event-time sort is needed — the per-batch SNAPSHOT is exact whenever
  * arrival is day-complete, and always converges to the batch ledger).
  *
  * Works identically on a static frame (one "batch" per shard), which
  * is what the equivalence spec pins against the groupBy formulation.
  */
object BacklogStream {

  case class Bound(shard: Int, ts: java.sql.Timestamp, delta: Long)
  case class Level(shard: Int, batch_rows: Long, opened: Long,
      closed: Long, backlog: Long)

  /** Per-shard running backlog from a (streaming or static) frame with
    * columns (shard, ts, delta ∈ {+1, −1}). */
  def levels(bounds: DataFrame): Dataset[Level] = {
    import bounds.sparkSession.implicits._
    bounds
      .select(col("shard"), col("ts"), col("delta"))
      .as[Bound]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[Long, Level](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          var b = state.getOption.getOrElse(0L)
          var op = 0L; var cl = 0L; var n = 0L
          it.foreach { e =>
            n += 1
            if (e.delta > 0) op += 1 else cl += 1
            b += e.delta
          }
          state.update(b)
          Iterator(Level(key, n, op, cl, b))
      }
  }
}
