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
  * Scale shape: per micro-batch this is the batch writer — connection
  * per partition, batched statements, transaction per partition — so
  * stream parallelism equals write parallelism; no state store, no
  * watermark (keyed idempotence replaces dedup state). */
object StreamUpsert {

  /** Start a foreachBatch upsert of `stream` into `table`. */
  def start(stream: DataFrame, url: String, props: Properties,
      table: String, conflictKey: String, batchSize: Int = 1000,
      sqlOverride: Option[String] = None,
      paramOrder: Option[Seq[Int]] = None): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Upsert.upsert(batch, url, props, table, conflictKey,
          batchSize, sqlOverride, paramOrder)
        ()
      }
      .start()
}
