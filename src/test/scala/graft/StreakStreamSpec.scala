package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreakStream

/** Per-user streaming streak tracking: static equivalence with q292's
  * gaps-and-islands census, and keyed-state continuation/reset across
  * micro-batches. */
class StreakStreamSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  test("static streaks: longest per user equals the q292 island census") {
    val got = StreakStream
      .streaks(queries.Kpis.eventsTable(spark, sfDir))
      .collect().map(u => (u.user_id, u.longest_streak))
    assert(got.nonEmpty)
    assert(got.map(_._1).distinct.length == got.length)
    // census of longest streaks must match q292's exactly
    val gotCensus = got.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = queries.SessionQueries
      .q292ActivityStreaks(spark, sfDir).collect()
      .map(r => r.getAs[Long]("longest_streak") -> r.getAs[Long]("n_users"))
      .toMap
    assert(gotCensus == expected)
  }

  test("streaming: continuation, gap reset, duplicate-day and late-day no-ops") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreakStream.Ev]
    val q = StreakStream.streaks(mem.toDF())
      .writeStream.format("memory").queryName("streak_out")
      .outputMode(OutputMode.Update()).start()
    def ts(day: Long, h: Int = 3) =
      new java.sql.Timestamp(day * 86400000L + h * 3600000L)
    def latest(): Map[Long, (Long, Long)] = {
      // Update mode appends a row per key per batch to the memory sink —
      // the LAST row per key is the live state
      val df = spark.table("streak_out")
      df.withColumn("rn", monotonically_increasing_id())
        .orderBy(col("rn"))
        .collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("current_streak"), r.getAs[Long]("longest_streak")))
        .toMap
    }
    try {
      // batch 1: user 1 active days 10,11 (one event twice on day 11);
      // user 2 active day 20
      mem.addData(
        StreakStream.Ev(1L, ts(10)), StreakStream.Ev(1L, ts(11)),
        StreakStream.Ev(1L, ts(11, 9)), StreakStream.Ev(2L, ts(20)))
      q.processAllAvailable()
      assert(latest() == Map(1L -> ((2L, 2L)), 2L -> ((1L, 1L))))
      // batch 2: user 1 continues (day 12) → 3; user 2 gaps (day 23) → reset
      mem.addData(StreakStream.Ev(1L, ts(12)), StreakStream.Ev(2L, ts(23)))
      q.processAllAvailable()
      assert(latest() == Map(1L -> ((3L, 3L)), 2L -> ((1L, 1L))))
      // batch 3: late replay of user 1 day 11 → state unchanged;
      // user 2 continues (day 24) → 2, longest 2
      mem.addData(StreakStream.Ev(1L, ts(11)), StreakStream.Ev(2L, ts(24)))
      q.processAllAvailable()
      assert(latest() == Map(1L -> ((3L, 3L)), 2L -> ((2L, 2L))))
      // batch 4: user 1 gaps (day 30) → current 1, longest stays 3
      mem.addData(StreakStream.Ev(1L, ts(30)))
      q.processAllAvailable()
      assert(latest() == Map(1L -> ((1L, 3L)), 2L -> ((2L, 2L))))
    } finally q.stop()
  }
}
