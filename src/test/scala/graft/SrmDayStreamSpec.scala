package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SrmStream

object SrmDayStreamSpec {
  case class Ev(ts_us: Long, user_id: Long)
}

/** Streaming daily SRM: the dropDuplicatesWithinWatermark → windowed-agg
  * chain emits q341's per-day verdict exactly once on watermark close,
  * and the emitted rows agree with the batch census computed over the
  * same replayed log. */
class SrmDayStreamSpec extends AnyFunSuite {
  import SrmDayStreamSpec.Ev
  import SparkTestSession.spark
  import spark.implicits._

  private def us(d: Int, h: Int): Long = (d * 86400L + h * 3600L) * 1000000L

  test("day verdicts emit on watermark close and match the batch census") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val src = mem.toDS()
      .select(timestamp_micros(col("ts_us")).as("ts"), col("user_id"))
      .withWatermark("ts", "1 hour")
    val q = SrmStream.verdictsPerDay(src)
      .writeStream.format("memory").queryName("srm_out")
      .outputMode(OutputMode.Append()).start()
    // day 1: users 1..40, several repeat events (dedup must collapse
    // them); split across two micro-batches so dedup state must merge.
    // Batch-2 timestamps stay at-or-above batch 1's maximum so the 1-hour
    // watermark never classifies them late.
    val day1 = (1L to 25L).map(u => Ev(us(1, 10), u)) ++
      (26L to 40L).map(u => Ev(us(1, 12), u))
    val repeats = (1L to 40L).map(u => Ev(us(1, 23), u))
    try {
      mem.addData(day1.take(25): _*)
      q.processAllAvailable()
      mem.addData(day1.drop(25) ++ repeats: _*)
      q.processAllAvailable()
      assert(spark.table("srm_out").count() == 0,
        "verdict emitted before the watermark closed the day")
      // day 3 traffic closes day 1
      mem.addData(Ev(us(3, 12), 999L))
      q.processAllAvailable()
      val got = spark.table("srm_out")
        .orderBy("day_start_s")
        .collect()
      assert(got.length == 1, s"expected day 1 only, got ${got.length}")
      // batch census over the same log restricted to the closed day —
      // q341's arithmetic verbatim
      val batch = (day1 ++ repeats).toDF("ts_us", "user_id")
        .select(timestamp_micros(col("ts_us")).as("ts"), col("user_id"))
        .select((floor(unix_micros(col("ts")) / 86400000000L) * 86400L)
          .as("day_start_s"), col("user_id"))
        .distinct()
        .withColumn("is_a",
          substring(md5(col("user_id").cast("string")), 1, 1) < "8")
        .groupBy(col("day_start_s"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"))
        .collect().head
      val r = got.head
      assert(r.getAs[Long]("day_start_s") == 86400L)
      assert(r.getAs[Long]("n") == batch.getAs[Long]("n") &&
        r.getAs[Long]("n") == 40L, "dedup must collapse repeat events")
      assert(r.getAs[Long]("n_a") == batch.getAs[Long]("n_a"))
      assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == r.getAs[Long]("n"))
      val nD = r.getAs[Long]("n").toDouble
      val zExp = (r.getAs[Long]("n_a").toDouble - nD * 0.5) /
        math.sqrt(nD * 0.25)
      assert(r.getAs[Double]("srm_z") == zExp)
      assert(r.getAs[Boolean]("srm_flag") == (math.abs(zExp) > 3.0))
    } finally q.stop()
  }
}
