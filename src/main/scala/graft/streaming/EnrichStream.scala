package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment — the streaming twin of the batch dimension
  * joins (q8/q67's broadcast-dim discipline): events flowing on a stream
  * pick up dimension attributes (user segment, region, tier) as they
  * pass, so every downstream consumer sees enriched rows without its own
  * join.
  *
  * The operator is a LEFT broadcast join against the static frame: left,
  * because an event whose key has no dimension row yet (a brand-new user
  * mid-stream — routine at ingest time) must flow on, tagged with a
  * sentinel, rather than silently vanish; broadcast, because a
  * stream-static join with a shuffled static side would re-shuffle the
  * DIMENSION every micro-batch — the broadcast ships it to executors
  * once per batch and the stream side never shuffles at all. Spark
  * re-plans the static side each micro-batch, so a dimension REWRITTEN
  * between batches (the SCD1-style refresh the reference's upsert sink
  * produces) is picked up on the next batch without restarting the
  * query — the property the spec pins.
  *
  * At 100 TB-stream scale the dimension must fit a broadcast (the usual
  * contract for enrichment dims); a fact-sized "dimension" belongs in a
  * stream-stream join with watermarks instead.
  */
object EnrichStream {

  /** Enrich `events` (streaming or static) with `dim`'s attributes via a
    * left broadcast join on `key`. Missing dimension attributes of
    * string type surface as `missing` (sentinel, not NULL — the q54
    * convention: downstream hash/group logic stays unambiguous). */
  def enriched(events: DataFrame, dim: DataFrame, key: String,
               missing: String = "unknown"): DataFrame = {
    val attrs = dim.columns.filterNot(_ == key)
    val joined = events.join(broadcast(dim), Seq(key), "left")
    dim.schema.fields.filter(f => attrs.contains(f.name)).foldLeft(joined) {
      case (df, f) if f.dataType.typeName == "string" =>
        df.withColumn(f.name, coalesce(col(f.name), lit(missing)))
      case (df, _) => df
    }
  }
}
