package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.operators.BandStore

/** Streaming admission twin of the persisted MinHash band store
  * (q98/q340; VERDICT r15 #1 — the last persisted store without a live
  * gate): documents arriving on a stream are probed for NEAR-duplication
  * against the STORED corpus before admission — the fuzzy verdict
  * q94's whole-doc hash (DedupStream) cannot see and the substring
  * store (SubstringProbeStream) only sees for verbatim spans.
  *
  * The frozen artifact is NOT collectable (the band + shingle tables
  * are the accumulated corpus), so — like [[SubstringProbeStream]] —
  * the twin follows [[StreamUpsert]]'s discipline: `foreachBatch` runs
  * the registered batch prober ([[BandStore.probeStore]], q435's
  * operator) against the store generation captured at query start. One
  * document's verdict (band-collide → Jaccard-verify → collapse) depends
  * on nothing but that document and the frozen store, so the output is
  * a pure function of the delivered doc set — independent of how the
  * log splits into micro-batches (the spec replays the same log in
  * different splits and gets identical rows).
  *
  * Generation discipline: `bands`/`shingles` are resolved ONCE, before
  * `start` — a concurrent GC (q340's anti-join rewrite) writes a NEW
  * generation and cannot disturb the running query; admitting the next
  * generation is an explicit restart, never a mid-flight mutation.
  *
  * Scale shape per micro-batch: exactly the batch probe — the store
  * side of the candidate join rides the bucket_key-bucketed scan and
  * the verify fetch rides the doc_id-bucketed shingle scan, both
  * exchange-free; only the micro-batch (8 band rows + one shingle set
  * per doc) pays shuffles. No state store, no watermark — statelessness
  * against a frozen generation replaces dedup state. */
object NearDupProbeStream {

  /** Start the admission gate: probe each micro-batch of `docs`
    * (doc_id, text) against the frozen store generation, writing
    * verdict rows (q435's schema — one per batch document, clean docs
    * included with is_near_dup = 0) as parquet under `outPath`,
    * partitioned by batch_id with dynamic-partition OVERWRITE so a
    * replayed micro-batch (at-least-once foreachBatch delivery)
    * rewrites its own partition instead of appending duplicates —
    * the output stays a pure function of the delivered doc set even
    * across sink retries. The replay-dedup guarantee holds ACROSS
    * RESTARTS only if batch ids are stable, which requires a DURABLE
    * `checkpointLocation` — without one Spark allocates a temp
    * checkpoint and batch ids restart at 0, overwriting old partitions
    * with differently-grouped data. Production callers must pass it;
    * the default (None) is for single-run tests only. */
  def start(docs: DataFrame, bands: DataFrame, shingles: DataFrame,
            outPath: String,
            checkpointLocation: Option[String] = None): StreamingQuery = {
    val w = docs.writeStream
      .outputMode(OutputMode.Append())
    checkpointLocation.foreach(w.option("checkpointLocation", _))
    w
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try {
          if (!b.isEmpty)
            BandStore.probeStore(b, bands, shingles)
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
