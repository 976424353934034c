package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SessionQueries
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Ev, Session}

/** Stateful-streaming sessionization vs the batch window-function twin. */
class SessionizeSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  private def eventsDs = graft.queries.Kpis.eventsTable(spark, sfDir)
    .select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("value"))
    .as[Ev]

  test("pure fold: gap closes sessions, totals exact, tiebreak on event_id") {
    val evs = Seq(
      Ev(1, 10, 1000000L, 1.5),
      Ev(1, 11, 2000000L, 2.25),             // same session (1s gap)
      Ev(1, 12, 10000000000L, 3.0),          // new session (huge gap)
      Ev(1, 13, 10000000000L, 0.5))          // tie ts → event_id order
    val (closed, open) =
      Sessionize.foldEvents(1L, evs, None, gapUs = 5000000L)
    assert(closed == List(Session(1, 1000000L, 2000000L, 2, 3.75)))
    assert(open == Some(Sessionize.OpenSession(
      10000000000L, 10000000000L, 2, 35000L)))
  }

  test("static-dataset sessions equal the batch window-function rollup") {
    // q34 emits second-granularity formatted bounds (oracle dump
    // convention); compare at seconds.
    val streamed = Sessionize.sessions(eventsDs, flushOpen = true)
      .collect()
      .map(s => (s.user_id, s.session_start_us / 1000000L,
        s.session_end_us / 1000000L, s.n_events, s.total_value)).toSet
    val batch = SessionQueries.q34Sessions(spark, sfDir)
      .select(col("user_id"),
        unix_seconds(to_timestamp(col("session_start"))).as("s"),
        unix_seconds(to_timestamp(col("session_end"))).as("e"),
        col("n_events"), col("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed == batch)
  }

  test("state persists across micro-batches; sessions span batch boundaries") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Sessionize.sessions(mem.toDS(), gapUs = 5000000L)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two events 1s apart (one open session)
      mem.addData(Ev(7, 1, 1000000L, 1.0), Ev(7, 2, 2000000L, 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // still open, nothing emitted
      // batch 2: continuation within gap, then a far event closes it
      mem.addData(Ev(7, 3, 3000000L, 4.0), Ev(7, 4, 100000000L, 8.0))
      q.processAllAvailable()
      val out = spark.table("sess_out").as[Session].collect()
      assert(out.length == 1)
      // the closed session spans batches 1 and 2: events 1,2,3
      assert(out.head == Session(7, 1000000L, 3000000L, 3, 7.0))
    } finally q.stop()
  }

  test("batch window-function session boundaries respect the 30min gap") {
    val rows = SessionQueries.q34Sessions(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // sessions of one user never overlap and starts are increasing
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("session_seq"))
      val bounds = ordered.map(r => (r.getAs[String]("session_start"),
        r.getAs[String]("session_end")))
      bounds.sliding(2).foreach {
        case Array((_, prevEnd), (nextStart, _)) =>
          assert(prevEnd < nextStart)
        case _ => ()
      }
    }
  }
}
