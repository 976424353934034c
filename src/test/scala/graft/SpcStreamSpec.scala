package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SpcStream

object SpcStreamSpec {
  case class Ev(ts_us: Long)
}

/** Streaming c-chart: frozen-limit arithmetic matches q253's batch
  * convention, and the daily verdict emits exactly once on watermark
  * close with the finished count. */
class SpcStreamSpec extends AnyFunSuite {
  import SpcStreamSpec.Ev
  import SparkTestSession.spark
  import spark.implicits._

  test("limitsOf matches the batch c-chart convention incl. LCL clamp") {
    val (ucl, lcl) = SpcStream.limitsOf(16.0)
    assert(math.abs(ucl - 28.0) < 1e-12 && math.abs(lcl - 4.0) < 1e-12)
    val (_, lcl0) = SpcStream.limitsOf(4.0) // 4 − 3·2 < 0 → clamp
    assert(lcl0 == 0.0)
  }

  test("daily verdict emits once on watermark close with the merged count") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val src = mem.toDS()
      .select(timestamp_micros(col("ts_us")).as("ts"))
      .withWatermark("ts", "1 hour")
    // baseline c̄ = 4 → UCL = 10, LCL = 0
    val q = SpcStream.pointsPerDay(src, 4.0)
      .writeStream.format("memory").queryName("spc_out")
      .outputMode(OutputMode.Append()).start()
    def us(d: Int, h: Int): Long = (d * 86400L + h * 3600L) * 1000000L
    try {
      // day 1: 11 events across two micro-batches (state must merge) —
      // above UCL = 10, so the closed day must flag out-of-control
      mem.addData((0 until 6).map(h => Ev(us(1, h))): _*)
      q.processAllAvailable()
      mem.addData((6 until 11).map(h => Ev(us(1, h))): _*)
      q.processAllAvailable()
      assert(spark.table("spc_out").count() == 0,
        "verdict emitted before the watermark closed the day")
      // day 3 traffic pushes the watermark past day 1's end
      mem.addData(Ev(us(3, 12)))
      q.processAllAvailable()
      val rows = spark.table("spc_out").as[SpcStream.SpcPoint].collect()
      assert(rows.length == 1)
      val p = rows.head
      assert(p.day_start_s == 86400L && p.n_events == 11L)
      assert(p.center == 4.0 && math.abs(p.ucl - 10.0) < 1e-12 &&
        p.lcl == 0.0)
      assert(p.out_of_control, "11 > UCL 10 must flag")
    } finally q.stop()
  }
}
