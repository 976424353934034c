package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcStream
import graft.streaming.CdcStream.{Change, Snap}

/** Streaming CDC snapshot: cross-batch latest-wins folding, tombstone
  * emission, stale-change suppression, and batch-twin agreement. */
class CdcStreamSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("snapshot folds across batches; tombstones emit; stale seqs lose") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Change]
    val q = CdcStream.snapshot(mem.toDS())
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode(OutputMode.Update()).start()
    try {
      def emitted(): Seq[Snap] =
        spark.table("cdc_out").as[Snap].collect().toSeq

      // batch 1: two upserts on key 1 (out of order), one on key 2
      mem.addData(
        Change(1L, 2L, "U", "one-v2"), Change(1L, 1L, "U", "one-v1"),
        Change(2L, 1L, "U", "two-v1"))
      q.processAllAvailable()
      val b1 = emitted()
      assert(b1.toSet == Set(
        Snap(1L, 2L, deleted = false, "one-v2", 2L),
        Snap(2L, 1L, deleted = false, "two-v1", 1L)))

      // batch 2: delete key 1; a STALE lower-seq upsert on key 2 must not
      // change its payload, only its version count
      mem.addData(Change(1L, 3L, "D", "x"), Change(2L, 0L, "U", "stale"))
      q.processAllAvailable()
      val b2 = emitted().diff(b1)
      assert(b2.toSet == Set(
        Snap(1L, 3L, deleted = true, "x", 3L),
        Snap(2L, 1L, deleted = false, "two-v1", 2L)))

      // batch 3: a stale upsert AFTER the tombstone stays suppressed
      mem.addData(Change(1L, 2L, "U", "zombie"))
      q.processAllAvailable()
      val b3 = emitted().diff(b1 ++ b2)
      assert(b3.toSet == Set(Snap(1L, 3L, deleted = true, "x", 4L)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS cdc_out")
      q.stop()
    }
  }

  test("late-arriving lower-seq change never rewinds the snapshot") {
    // CdcStream is deliberately unwatermarked (seq, not event time, is
    // the order): a change arriving arbitrarily late with a stale seq
    // must only bump n_versions — payload, last_seq, and deleted flag
    // all stand (the documented max-seq-wins fold)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Change]
    val q = CdcStream.snapshot(mem.toDS())
      .writeStream.format("memory").queryName("cdc_late_out")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(Change(5L, 10L, "U", "current"))
      q.processAllAvailable()
      mem.addData(Change(9L, 1L, "U", "other-key")) // unrelated traffic
      q.processAllAvailable()
      mem.addData(Change(5L, 2L, "U", "ancient")) // LATE, stale seq
      q.processAllAvailable()
      val last = spark.table("cdc_late_out").as[Snap].collect()
        .filter(_.key == 5L).maxBy(_.n_versions)
      assert(last == Snap(5L, 10L, deleted = false, "current", 2L),
        s"late stale change must not rewind the snapshot; got $last")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cdc_late_out")
      q.stop()
    }
  }

  test("static fold agrees with any batch split of the same changelog") {
    val log = Seq(
      Change(1L, 1L, "U", "a"), Change(1L, 3L, "U", "c"),
      Change(1L, 2L, "D", "b"), Change(2L, 1L, "U", "x"),
      Change(2L, 2L, "D", "y"))
    // one-shot fold
    val whole = CdcStream.foldChanges(1L, log.filter(_.key == 1L), None)
    // per-element arrival, every permutation of one split point
    log.filter(_.key == 1L).permutations.take(6).foreach { perm =>
      val (h, t) = perm.splitAt(1)
      val step = CdcStream.foldChanges(1L, t,
        Some(CdcStream.foldChanges(1L, h, None)))
      assert(step == whole, s"order-dependent fold for $perm")
    }
    assert(whole == Snap(1L, 3L, deleted = false, "c", 3L))
    // the typed static path agrees too
    val static = CdcStream.snapshot(log.toDS()).collect().toSet
    assert(static == Set(
      Snap(1L, 3L, deleted = false, "c", 3L),
      Snap(2L, 2L, deleted = true, "y", 2L)))
  }
}
