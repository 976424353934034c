package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.BoilerStore

/** Streaming admission twin of the persisted boilerplate-fingerprint
  * store ([[BoilerStore]], q450's operator): documents arriving on a
  * stream are screened for KNOWN template text before admission — the
  * chunk-granularity verdict none of the existing gates see (exact-hash
  * and near-dup judge whole documents; the substring store sees verbatim
  * spans but needs the heavy position chain; this gate answers the
  * cheaper, more common question "is this mostly boilerplate we have
  * already catalogued?").
  *
  * Same discipline as [[NearDupProbeStream]]/[[SubstringProbeStream]]:
  * the frozen artifact (the fp-bucketed incidence table) is not
  * collectable, so `foreachBatch` runs the registered batch prober
  * ([[BoilerStore.probeStore]]) against the generation captured at query
  * start. One document's verdict depends on nothing but that document
  * and the frozen store — a pure function of the delivered doc set,
  * independent of micro-batch splits (the spec replays one log under two
  * splits and gets identical rows). A concurrent append/retire writes a
  * NEW generation; admitting it is an explicit restart.
  *
  * Scale shape per micro-batch: CDC-chunking is per-row array
  * expressions; the store side of the fp join rides the bucketed scan
  * (exchange-free); only the batch's distinct fps shuffle. Stateless —
  * no state store, no watermark. */
object BoilerProbeStream {

  /** Start the admission gate: probe each micro-batch of `docs`
    * (doc_id, text) against the frozen incidence generation, writing
    * verdict rows (q450's schema — one per batch document, clean docs
    * included) as parquet under `outPath`, partitioned by batch_id with
    * dynamic-partition OVERWRITE so a replayed micro-batch rewrites its
    * own partition. Replay-dedup across RESTARTS needs stable batch ids
    * → pass a durable `checkpointLocation` in production (the None
    * default is for single-run tests only). */
  def start(docs: DataFrame, inc: DataFrame, outPath: String,
            checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = docs.writeStream
      .outputMode(OutputMode.Append())
    checkpointLocation.foreach(w.option("checkpointLocation", _))
    w
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try {
          if (!b.isEmpty)
            BoilerStore.probeStore(b, inc)
              .withColumn("batch_id",
                org.apache.spark.sql.functions.lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(outPath)
        } finally { b.unpersist(); () }
      }
      .start()
  }
}
