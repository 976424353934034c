package graft.streaming

import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.sink.Upsert

/** Streaming face of the JDBC upsert sink — the exactly-once-EFFECT
  * composition the reference's batch upsert implies but never states:
  * Structured Streaming's `foreachBatch` guarantees at-least-once batch
  * delivery (a crashed epoch re-runs), and the keyed upsert makes the
  * redelivery idempotent, so the TABLE converges to the same state as a
  * batch keep-latest load no matter how batches are split, retried, or
  * partially repeated. One statement template per dialect rides through
  * `sqlOverride` exactly as in [[graft.sink.Upsert.upsert]] (Postgres ON
  * CONFLICT in production; the embedded-Derby spec drives the identical
  * partition/batch/transaction path through Derby's standard MERGE).
  *
  * Convergence caveat: idempotence-by-key makes REDELIVERY of the same
  * rows a no-op, but if one micro-batch carries TWO DIFFERENT payloads
  * for the same `conflictKey` in different partitions, raw commit order
  * would decide the winner nondeterministically. `dedupeBatch` (default
  * on) closes that hole by collapsing each batch to one row per key
  * before the write — the deterministic max-struct of the payload
  * columns — so the converged table is a pure function of the delivered
  * row SET, independent of batch splits, retries, and partition order.
  *
  * Scale shape: per micro-batch this is the batch writer — connection
  * per partition, batched statements, transaction per partition — so
  * stream parallelism equals write parallelism; no state store, no
  * watermark (keyed idempotence replaces dedup state). The pre-dedupe
  * is one map-combinable max-aggregate on the conflict key, shuffled at
  * micro-batch (not corpus) scale. */
object StreamUpsert {

  /** Start a foreachBatch upsert of `stream` into `table`. */
  def start(stream: DataFrame, url: String, props: Properties,
      table: String, conflictKey: String, batchSize: Int = 1000,
      sqlOverride: Option[String] = None,
      paramOrder: Option[Seq[Int]] = None,
      dedupeBatch: Boolean = true): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val toWrite =
          if (!dedupeBatch) batch
          else {
            import org.apache.spark.sql.functions.{col, max, struct}
            val payload = batch.columns.filter(_ != conflictKey).toSeq
            if (payload.isEmpty) batch.distinct()
            else batch.groupBy(col(conflictKey))
              .agg(max(struct(payload.map(col): _*)).as("__p"))
              .select(col(conflictKey) +:
                payload.map(c => col(s"__p.$c").as(c)): _*)
          }
        Upsert.upsert(toWrite, url, props, table, conflictKey,
          batchSize, sqlOverride, paramOrder)
        ()
      }
      .start()
}
