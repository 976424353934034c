package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.HeavyHitterStream

/** Streaming heavy-hitter alerts: exactly-once threshold crossing with
  * exact counts accumulated across micro-batches. */
class HeavyHitterStreamSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("each token alerts exactly once, at its first crossing batch") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[String]
    val q = HeavyHitterStream
      .thresholdAlerts(mem.toDF().toDF("token"), threshold = 3)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: a=2 b=1 — nobody crosses yet
      mem.addData("a", "a", "b")
      q.processAllAvailable()
      assert(spark.table("hh_out").count() == 0)
      // batch 2: a reaches 4 (crosses, reported count = 4), b reaches 2
      mem.addData("a", "a", "b")
      q.processAllAvailable()
      val after2 = spark.table("hh_out").as[(String, Long)].collect().toSet
      assert(after2 == Set(("a", 4L)), s"got $after2")
      // batch 3: b crosses at exactly 3; a must NOT re-alert
      mem.addData("b", "a")
      q.processAllAvailable()
      val after3 = spark.table("hh_out").as[(String, Long)].collect().toSet
      assert(after3 == Set(("a", 4L), ("b", 3L)), s"got $after3")
      // batch 4: more of both — no new alerts ever
      mem.addData("a", "b", "a", "b")
      q.processAllAvailable()
      assert(spark.table("hh_out").count() == 2, "alert fired twice")
    } finally q.stop()
  }

  test("streaming alert set equals the batch heavy-hitter set on a replay") {
    implicit val sc = spark.sqlContext
    val tokens = Seq("x", "y", "x", "z", "x", "y", "w", "x", "y", "z")
    val threshold = 3L
    val mem = MemoryStream[String]
    val q = HeavyHitterStream
      .thresholdAlerts(mem.toDF().toDF("token"), threshold)
      .writeStream.format("memory").queryName("hh_replay")
      .outputMode(OutputMode.Append()).start()
    try {
      tokens.grouped(3).foreach { batch =>
        mem.addData(batch: _*); q.processAllAvailable()
      }
      val streamed = spark.table("hh_replay").as[(String, Long)]
        .collect().map(_._1).toSet
      val batchSet = tokens.groupBy(identity).collect {
        case (t, n) if n.size >= threshold => t
      }.toSet
      assert(streamed == batchSet, s"stream=$streamed batch=$batchSet")
    } finally q.stop()
  }
}
