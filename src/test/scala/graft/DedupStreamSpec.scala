package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStream

object DedupStreamSpec {
  // top-level: inner case classes cannot get encoders
  final case class DocIn(doc_id: Long, ts: Timestamp, text: String)
}

/** Streaming fingerprint dedup: one-representative-per-fingerprint within
  * the watermark horizon, duplicate suppression across micro-batches, and
  * state EVICTION after the horizon passes (the bounded-state property
  * that distinguishes it from plain streaming dropDuplicates). */
class DedupStreamSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._
  import DedupStreamSpec.DocIn

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("duplicates within the horizon are dropped, including across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val q = DedupStream.dedupedDocs(mem.toDF(), "ts", "30 seconds")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two distinct docs + an in-batch duplicate text
      mem.addData(
        DocIn(1, t(0), "alpha beta gamma"),
        DocIn(2, t(1), "delta epsilon"),
        DocIn(3, t(2), "Alpha  Beta   GAMMA")) // same canonical fingerprint as doc 1
      q.processAllAvailable()
      val b1 = spark.table("dedup_out").as[(Long, Timestamp, String, String)]
        .collect().map(_._1).sorted
      // exactly ONE representative per fingerprint (within a micro-batch
      // the surviving row is arbitrary — no event-time order guarantee)
      assert(b1.length == 2 && b1.contains(2L) &&
        (b1.contains(1L) || b1.contains(3L)),
        s"one representative per fingerprint; got ${b1.toSeq}")
      // batch 2: a cross-batch duplicate still inside the horizon
      mem.addData(DocIn(4, t(5), "alpha beta gamma"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2, "cross-batch dup dropped")
      // batch 3: advance event time far past the horizon (evicts state)
      mem.addData(DocIn(5, t(200), "unrelated content"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 3)
      // batch 4: the same text AFTER eviction re-emits — bounded state has
      // exactly this documented trade (cross-horizon dedup is the batch
      // pass's job)
      mem.addData(DocIn(6, t(201), "alpha beta gamma"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").as[(Long, Timestamp, String, String)]
        .collect().map(_._1).toSet
      assert(ids.contains(6L) && ids.contains(5L) && ids.size == 4,
        s"post-eviction re-arrival must re-emit (state is bounded); got $ids")
    } finally q.stop()
  }

  test("document behind the watermark is DROPPED, novel or duplicate") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[DocIn]
    val q = DedupStream.dedupedDocs(mem.toDF(), "ts", "30 seconds")
      .writeStream.format("memory").queryName("dedup_late_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // start above 0: a ts at the initial watermark would itself drop
      mem.addData(DocIn(1, t(1000), "alpha beta gamma"))
      q.processAllAvailable()
      // advance event time to t=1500 → watermark moves to ~1470
      mem.addData(DocIn(2, t(1500), "fresh content"))
      q.processAllAvailable()
      assert(spark.table("dedup_late_out").count() == 2)
      // behind the watermark: a NOVEL doc and a duplicate, both at t=1100.
      // Documented semantics: rows older than the watermark are late and
      // dropped by the stateful dedup — they must NOT emit (novel one
      // included; cross-horizon work belongs to the exact batch pass q19)
      mem.addData(
        DocIn(3, t(1100), "never seen before text"),
        DocIn(4, t(1100), "alpha beta gamma"))
      q.processAllAvailable()
      val ids = spark.table("dedup_late_out").as[(Long, Timestamp, String, String)]
        .collect().map(_._1).toSet
      assert(ids == Set(1L, 2L),
        s"late-behind-watermark docs must be dropped, not emitted; got $ids")
    } finally {
      spark.sql("DROP TABLE IF EXISTS dedup_late_out")
      q.stop()
    }
  }

  test("static-frame form dedups like the batch fingerprint family") {
    val docs = Seq(
      DocIn(1, t(0), "one two three"),
      DocIn(2, t(1), "ONE  two   THREE"),
      DocIn(3, t(2), "different")).toDF()
    val out = DedupStream.dedupedDocs(docs, "ts", "30 seconds")
      .select("doc_id").as[Long].collect().sorted
    assert(out.length == 2 && out.contains(3L))
  }
}
