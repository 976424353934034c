package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Attribution

object AttributionSpec {
  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long,
                      value: Double)
}

/** Stream-stream click→purchase attribution: in-window pairs join
  * (including across micro-batches), out-of-window pairs don't, and
  * other users never match. */
class AttributionSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._
  import AttributionSpec.Ev

  // offset from epoch: a ts of exactly 0 is not ABOVE the initial
  // watermark (0) and would be dropped as late
  private def t(sec: Long) = new Timestamp((100000L + sec) * 1000L)

  test("stream-stream join matches in-window purchases across batches") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = Attribution.attribute(
        clicks.toDF().withWatermark("ts", "10 minutes"),
        purchases.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 clicks at t=0; purchase 10 min later → attributed
      clicks.addData(Ev(1L, t(0), 100L, 0.0))
      purchases.addData(Ev(1L, t(600), 200L, 9.99))
      q.processAllAvailable()
      def pairs(): Set[(Long, Long)] = spark.table("attr_out")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(pairs() == Set((100L, 200L)))

      // batch 2: purchase 40 min after the click → outside the window;
      // user 2's purchase has no click → no row either
      purchases.addData(Ev(1L, t(2400), 201L, 5.0), Ev(2L, t(650), 202L, 1.0))
      q.processAllAvailable()
      assert(pairs() == Set((100L, 200L)))

      // batch 3: a LATER-ARRIVING purchase still inside user 1's window
      // joins across batches (state retained under the watermark)
      purchases.addData(Ev(1L, t(1200), 203L, 2.5))
      q.processAllAvailable()
      assert(pairs() == Set((100L, 200L), (100L, 203L)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS attr_out")
      q.stop()
    }
  }

  test("purchase behind the watermark is dropped; aged click cannot rematch") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = Attribution.attribute(
        clicks.toDF().withWatermark("ts", "10 minutes"),
        purchases.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("attr_late_out")
      .outputMode(OutputMode.Append()).start()
    try {
      def pairs(): Set[(Long, Long)] = spark.table("attr_late_out")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      // sanity: an in-window purchase attributes
      clicks.addData(Ev(1L, t(0), 100L, 0.0))
      purchases.addData(Ev(1L, t(600), 200L, 9.99))
      q.processAllAvailable()
      assert(pairs() == Set((100L, 200L)))
      // advance BOTH streams ~2 h → global watermark ≈ t+6600 s; user 1's
      // click state ages out (watermark passed c_ts + 30 min interval)
      clicks.addData(Ev(7L, t(7200), 777L, 0.0))
      purchases.addData(Ev(8L, t(7200), 888L, 1.0))
      q.processAllAvailable()
      // a purchase at t+20 min — inside the click's window but BEHIND the
      // watermark. Documented semantics (Attribution scaladoc): join state
      // ages out once the watermark passes the interval, and late input
      // rows are dropped — so this purchase must produce NO pair
      purchases.addData(Ev(1L, t(1200), 299L, 3.0))
      q.processAllAvailable()
      assert(pairs() == Set((100L, 200L)),
        s"behind-watermark purchase must be dropped (aged click state " +
          s"cannot rematch); got ${pairs()}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS attr_late_out")
      q.stop()
    }
  }

  test("static attribution: strict ordering, bounded window, same user") {
    val rows = Attribution.q75Attribution(spark, SparkTestSession.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("mins_to_purchase")
      assert(m > 0.0 && m <= 30.0, s"window violated: $m")
    }
  }
}
