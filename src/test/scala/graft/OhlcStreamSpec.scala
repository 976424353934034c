package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MarketQueries
import graft.streaming.OhlcStream

object OhlcStreamSpec {
  case class Tick(event_id: Long, ts_us: Long, value: Double)
}

/** Streaming OHLC bars: batch equivalence against q135 and
  * watermark-gated Append emission. */
class OhlcStreamSpec extends AnyFunSuite {
  import OhlcStreamSpec.Tick
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  test("static hourlyBars reproduce q135 exactly (hour-aligned windows)") {
    val bars = OhlcStream
      .hourlyBars(queries.Kpis.eventsTable(spark, sfDir)
        .select(col("ts"), col("event_id"), col("value")))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
    val batch = MarketQueries.q135OhlcHourly(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
    assert(bars == batch)
  }

  test("streaming bars emit once per closed hour; open/close pick by time") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Tick]
    val src = mem.toDS()
      .select(timestamp_micros(col("ts_us")).as("ts"),
        col("event_id"), col("value"))
      .withWatermark("ts", "10 minutes")
    val q = OhlcStream.hourlyBars(src)
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode(OutputMode.Append()).start()
    def us(h: Int, m: Int): Long = (h * 3600L + m * 60L) * 1000000L
    try {
      // hour 1: out-of-order arrivals — open must still be the earliest
      // BY EVENT TIME (value 5.0 at :05), close the latest (9.0 at :55)
      mem.addData(Tick(2, us(1, 30), 1.0), Tick(1, us(1, 5), 5.0),
        Tick(3, us(1, 55), 9.0))
      q.processAllAvailable()
      assert(spark.table("ohlc_out").count() == 0,
        "bar emitted before watermark closed the hour")
      // hour 3 arrival pushes the watermark past hour 1's end
      mem.addData(Tick(4, us(3, 20), 2.0))
      q.processAllAvailable()
      val bars = spark.table("ohlc_out")
        .select("bar_hour", "open", "high", "low", "close", "n_events")
        .collect()
      assert(bars.length == 1)
      val b = bars.head
      assert(b.getString(0).endsWith("01:00:00"))
      assert(b.getDouble(1) == 5.0 && b.getDouble(2) == 9.0 &&
        b.getDouble(3) == 1.0 && b.getDouble(4) == 9.0 &&
        b.getLong(5) == 3L)
    } finally q.stop()
  }
}
