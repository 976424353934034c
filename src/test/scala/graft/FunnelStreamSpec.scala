package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.FunnelQueries
import graft.streaming.FunnelStream
import graft.streaming.FunnelStream.{Ev, StageHit}

/** Streaming funnel: batch-equivalence against q86 and cross-batch state. */
class FunnelStreamSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  test("static stageHits reproduce the batch funnel counts exactly") {
    val evs = queries.Kpis.eventsTable(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[Ev]
    val streamed = FunnelStream.stageHits(evs).collect()
      .groupBy(_.stage).view.mapValues(_.length.toLong).toMap
    val batch = FunnelQueries.q86Funnel(spark, sfDir).collect()
      .map(r => r.getAs[Int]("stage") -> r.getAs[Long]("n_users")).toMap
    assert((1 to 3).forall(s =>
      streamed.getOrElse(s, 0L) == batch(s)),
      s"streamed $streamed vs batch $batch")
  }

  test("funnel state persists across micro-batches; ties stay rejected") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = FunnelStream.stageHits(mem.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: view at t=1s, click at the SAME instant (must not clear)
      mem.addData(Ev(7, 1, 1000000L, "view"), Ev(7, 2, 1000000L, "click"))
      q.processAllAvailable()
      assert(spark.table("funnel_out").as[StageHit].collect().toSet ==
        Set(StageHit(7, 1, 1000000L)))
      // batch 2: a later click clears stage 2 using batch-1 state;
      // a purchase strictly after it clears stage 3 in the same batch
      mem.addData(Ev(7, 3, 2000000L, "click"), Ev(7, 4, 3000000L, "purchase"))
      q.processAllAvailable()
      assert(spark.table("funnel_out").as[StageHit].collect().toSet ==
        Set(StageHit(7, 1, 1000000L), StageHit(7, 2, 2000000L),
          StageHit(7, 3, 3000000L)))
    } finally q.stop()
  }

  test("late earlier-time events never retract or re-emit a cleared stage") {
    // FunnelStream documents Append-mode monotonicity: a hit, once
    // emitted, can never be retracted — so an event-time-EARLIER event
    // arriving in a later micro-batch (violating the per-key ordering
    // assumption) must neither re-emit stage 1 nor clear stage 2 with a
    // timestamp at-or-before t1
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = FunnelStream.stageHits(mem.toDS())
      .writeStream.format("memory").queryName("funnel_late_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Ev(3, 1, 5000000L, "view"))
      q.processAllAvailable()
      assert(spark.table("funnel_late_out").as[StageHit].collect().toSet ==
        Set(StageHit(3, 1, 5000000L)))
      // late batch: an earlier view (no re-emit) and an earlier click
      // (ts <= t1 — must NOT clear stage 2)
      mem.addData(Ev(3, 2, 3000000L, "view"), Ev(3, 3, 4000000L, "click"))
      q.processAllAvailable()
      assert(spark.table("funnel_late_out").as[StageHit].collect().toSet ==
        Set(StageHit(3, 1, 5000000L)),
        "late earlier events must not re-emit or clear stages (monotone Append)")
      // a genuinely later click still clears stage 2
      mem.addData(Ev(3, 4, 6000000L, "click"))
      q.processAllAvailable()
      assert(spark.table("funnel_late_out").as[StageHit].collect().toSet ==
        Set(StageHit(3, 1, 5000000L), StageHit(3, 2, 6000000L)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS funnel_late_out")
      q.stop()
    }
  }

  test("pre-1970 event times clear stages once (Unset sentinel, not -1)") {
    // ts_us < 0: with the old -1 sentinel stage 1 could never 'set',
    // re-emitting a hit on every later view and never clearing stage 2
    val (hits1, st1) = FunnelStream.fold(9L,
      Seq(Ev(9, 1, -5000000L, "view")),
      FunnelStream.FState(FunnelStream.Unset, FunnelStream.Unset,
        FunnelStream.Unset))
    assert(hits1 == List(StageHit(9, 1, -5000000L)))
    assert(st1.t1 == -5000000L && st1.t2 == FunnelStream.Unset)
    val (hits2, st2) = FunnelStream.fold(9L,
      Seq(Ev(9, 2, -4000000L, "view"),      // second view: must NOT re-emit
        Ev(9, 3, -3000000L, "click"),        // clears stage 2 (after t1)
        Ev(9, 4, -2000000L, "purchase")), st1)
    assert(hits2 == List(StageHit(9, 2, -3000000L), StageHit(9, 3, -2000000L)))
    assert(st2 == FunnelStream.FState(-5000000L, -3000000L, -2000000L))
  }
}
