package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming exact dedup — the in-flight twin of the batch fingerprint
  * dedup family (q19/q25): documents arriving on a stream are deduped by
  * canonical-text fingerprint as they flow, so duplicates never reach the
  * sink or the downstream near-dup stages.
  *
  * The operator is `withWatermark` + `dropDuplicatesWithinWatermark` on
  * the md5 fingerprint: exactly-once emission of ONE representative per
  * fingerprint among events inside the watermark horizon (within a
  * micro-batch the survivor is arbitrary — duplicates are equal-content
  * by construction, so any representative is correct). The watermark
  * is what makes this a 100 TB-stream operator: plain `dropDuplicates` on
  * a stream keeps every key seen FOREVER (state grows with the corpus —
  * unbounded), while the watermarked form evicts fingerprints once event
  * time passes them, so state is bounded by the dedup horizon's arrival
  * rate. The trade is explicit and standard: a duplicate arriving later
  * than the horizon re-emits — cross-horizon dedup belongs to the batch
  * compaction pass (q19), which is exact.
  */
object DedupStream {

  /** Dedup a document frame by canonical-text fingerprint. Streaming
    * input: watermarked, state-bounded dedup within `horizon` of
    * event-time column `tsCol`. Static input: the exact batch form (plain
    * dropDuplicates — `dropDuplicatesWithinWatermark` is streaming-only,
    * and a complete frame needs no horizon). Emits the input columns plus
    * the `fp` fingerprint. */
  def dedupedDocs(docs: DataFrame, tsCol: String,
                  horizon: String): DataFrame = {
    val withFp = docs.withColumn("fp", TextFunctions.fingerprint(col("text")))
    if (docs.isStreaming)
      withFp.withWatermark(tsCol, horizon).dropDuplicatesWithinWatermark("fp")
    else withFp.dropDuplicates("fp")
  }
}
