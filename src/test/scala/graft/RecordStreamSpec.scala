package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.RecordStream

/** Per-event-type streaming record detection: static equivalence with
  * the exclusive-running-max window formulation (q210's semantics keyed
  * by type), and incremental keyed-state emission across micro-batches. */
class RecordStreamSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  private def batchReference = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    queries.Kpis.eventsTable(spark, sfDir)
      .withColumn("pm", max(col("value")).over(w))
      .filter(col("pm").isNull || col("value") > col("pm"))
      .select("event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
  }

  test("static records equal the per-type exclusive-running-max window") {
    val got = RecordStream
      .records(queries.Kpis.eventsTable(spark, sfDir))
      .collect().map(r => (r.event_type, r.event_id)).toSet
    assert(got == batchReference)
    assert(got.nonEmpty)
  }

  test("streaming emission: state carries across batches, in-batch sort by event time") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[RecordStream.Ev]
    val q = RecordStream.records(mem.toDF())
      .writeStream.format("memory").queryName("rec_out")
      .outputMode(OutputMode.Append()).start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    try {
      // batch 1 arrives OUT of event-time order: the id=2/value=3.0 event
      // precedes id=1/value=5.0 in event time, so both are records
      mem.addData(
        RecordStream.Ev("a", ts(20), 1L, 5.0),
        RecordStream.Ev("a", ts(10), 2L, 3.0),
        RecordStream.Ev("b", ts(15), 3L, 1.0))
      q.processAllAvailable()
      val b1 = spark.table("rec_out").as[RecordStream.Rec]
        .collect().map(r => (r.event_type, r.event_id)).toSet
      assert(b1 == Set(("a", 2L), ("a", 1L), ("b", 3L)))
      // batch 2: 4.0 < running max 5.0 for 'a' (no record; state carried);
      // 6.0 is a new record; 'b' ties exactly (strict > ⇒ no record)
      mem.addData(
        RecordStream.Ev("a", ts(30), 4L, 4.0),
        RecordStream.Ev("a", ts(40), 5L, 6.0),
        RecordStream.Ev("b", ts(35), 6L, 1.0))
      q.processAllAvailable()
      val all = spark.table("rec_out").as[RecordStream.Rec]
        .collect().map(r => (r.event_type, r.event_id)).toSet
      assert(all == b1 + (("a", 5L)))
    } finally q.stop()
  }
}
