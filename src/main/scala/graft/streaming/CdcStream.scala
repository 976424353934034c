package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming CDC snapshot — the in-flight twin of the batch changelog
  * compaction ([[graft.operators.ChangelogCompact]]): upsert/tombstone
  * changes arriving on a stream fold into one keyed state row, and every
  * micro-batch emits the refreshed snapshot row for each touched key
  * (deletes emit with `deleted = true` — a downstream sink needs the
  * tombstone, not silence).
  *
  * Semantics match the batch operator: highest `seq` wins regardless of
  * arrival order (a late change with a lower seq only bumps the version
  * count), so replaying the same changelog in any batch partitioning
  * converges to the same snapshot. State is one row per LIVE key — the
  * natural floor for a keyed snapshot; keys whose final state is a
  * tombstone still occupy state so that even-later stale upserts with
  * lower seqs stay suppressed (production would age tombstones out with
  * a timeout once the changelog's lateness horizon passes).
  */
object CdcStream {

  final case class Change(key: Long, seq: Long, op: String, payload: String)
  final case class Snap(key: Long, last_seq: Long, deleted: Boolean,
                        payload: String, n_versions: Long)

  /** Fold a batch of changes into the running snapshot: max-seq wins,
    * every change counts toward n_versions. */
  def foldChanges(key: Long, cs: Seq[Change], prev: Option[Snap]): Snap =
    cs.foldLeft(prev.getOrElse(
      Snap(key, Long.MinValue, deleted = true, "", 0L))) { (s, c) =>
      if (c.seq > s.last_seq)
        Snap(key, c.seq, c.op == "D", c.payload, s.n_versions + 1)
      else s.copy(n_versions = s.n_versions + 1)
    }

  /** Works on a streaming Dataset (state persists across micro-batches,
    * Update output mode) and on a static Dataset (one fold per key). */
  def snapshot(changes: Dataset[Change]): Dataset[Snap] = {
    implicit val snapEnc = Encoders.product[Snap]
    implicit val keyEnc = Encoders.scalaLong
    changes.groupByKey(_.key)
      .mapGroupsWithState[Snap, Snap](GroupStateTimeout.NoTimeout()) {
        (key: Long, cs: Iterator[Change], state: GroupState[Snap]) =>
          val s = foldChanges(key, cs.toSeq, state.getOption)
          state.update(s)
          s
      }
  }
}
