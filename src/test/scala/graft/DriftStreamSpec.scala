package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DriftStream

object DriftStreamSpec {
  case class Ev(ts_us: Long, bucket: Int)
}

/** Streaming PSI drift gate: watermark-close exactly-once emission and
  * numeric agreement with the same histogram computed in batch. */
class DriftStreamSpec extends AnyFunSuite {
  import DriftStreamSpec.Ev
  import SparkTestSession.spark
  import spark.implicits._

  private val ref = Map(0 -> 0.5, 1 -> 0.3, 2 -> 0.2)

  test("psiOf: zero drift on the reference itself, positive on a shifted histogram") {
    val (n, psi0) = DriftStream.psiOf(
      Map(0 -> 500L, 1 -> 300L, 2 -> 200L), ref, 3)
    assert(n == 1000L && math.abs(psi0) < 1e-12)
    val (_, psiShift) = DriftStream.psiOf(
      Map(0 -> 200L, 1 -> 300L, 2 -> 500L), ref, 3)
    assert(psiShift > 0.1)
  }

  test("hour PSI emits once on watermark close and matches the batch computation") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val src = mem.toDS()
      .select(timestamp_micros(col("ts_us")).as("ts"), col("bucket"))
      .withWatermark("ts", "10 minutes")
    val q = DriftStream.psiPerHour(src, ref, 3)
      .writeStream.format("memory").queryName("psi_out")
      .outputMode(OutputMode.Append()).start()
    def us(h: Int, m: Int): Long = (h * 3600L + m * 60L) * 1000000L
    try {
      // hour 1 arrives across TWO micro-batches (state must merge)
      mem.addData(Ev(us(1, 5), 0), Ev(us(1, 10), 2), Ev(us(1, 20), 2))
      q.processAllAvailable()
      mem.addData(Ev(us(1, 40), 1), Ev(us(1, 50), 2))
      q.processAllAvailable()
      assert(spark.table("psi_out").count() == 0,
        "PSI emitted before the watermark closed the hour")
      // hour 3 traffic pushes the watermark past hour 1's end
      mem.addData(Ev(us(3, 30), 0))
      q.processAllAvailable()
      val rows = spark.table("psi_out").as[DriftStream.Psi].collect()
      assert(rows.length == 1)
      val got = rows.head
      assert(got.hour_start_s == 3600L && got.n_events == 5L)
      val (n, want) = DriftStream.psiOf(
        Map(0 -> 1L, 1 -> 1L, 2 -> 3L), ref, 3)
      assert(n == 5L)
      assert(math.abs(got.psi - want) < 1e-12,
        s"stream psi ${got.psi} != batch psi $want")
      assert(got.psi > 0.1, "shifted hour should show drift")
    } finally q.stop()
  }
}
