package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LookStream

object LookStreamSpec {
  case class Ev(ts_us: Long, user_id: Long, event_type: String)
}

/** Streaming group-sequential looks: the replayed sf0.001 event log,
  * run through [[LookStream.finalizedUsers]] (exactly-once per-user
  * finalization on the c₄ watermark close) and the shared
  * [[LookStream.obfLooks]] reduce, reproduces the registered q316
  * batch output row for row — z doubles included, since every moment
  * is a sum of exact longs. */
class LookStreamSpec extends AnyFunSuite {
  import LookStreamSpec.Ev
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  test("replayed event log reproduces q316's registered looks row for row") {
    // q316's cutoff derivation, replicated exactly (min + span·k/4,
    // integer micros)
    val ev = graft.queries.Kpis.eventsTable(spark, sfDir)
      .select(col("ts"), col("user_id"), col("event_type"))
    val mm = ev.agg(min(unix_micros(col("ts"))).as("t0"),
      max(unix_micros(col("ts"))).as("t1")).head()
    val (t0, t1) = (mm.getLong(0), mm.getLong(1))
    val cuts = (1 to 4).map(k => t0 + (t1 - t0) * k / 4)

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val src = mem.toDS()
      .select(timestamp_micros(col("ts_us")).as("ts"), col("user_id"),
        col("event_type"))
      // 1 hour of slack: the replay halves split mid-log, and a zero
      // delay would classify any batch-2 event sharing batch 1's maximum
      // timestamp as late
      .withWatermark("ts", "1 hour")
    val q = LookStream.finalizedUsers(src, cuts)
      .writeStream.format("memory").queryName("look_users")
      .outputMode(OutputMode.Append()).start()
    try {
      // replay the log in event-time order across two micro-batches
      val log = ev.select(unix_micros(col("ts")).as("ts_us"),
          col("user_id").cast("long"), col("event_type"))
        .as[Ev].collect().sortBy(_.ts_us)
      val (h1, h2) = log.splitAt(log.length / 2)
      mem.addData(h1.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(h2.toIndexedSeq: _*)
      q.processAllAvailable()
      assert(spark.table("look_users").count() == 0,
        "users finalized before the watermark passed c4")
      // a sentinel past c4 closes the experiment; its own user (id -1,
      // absent from the fixture) stays unflushed in state and never
      // reaches the looks (first_t > c4 would exclude it anyway)
      mem.addData(Ev(t1 + 3L * 86400000000L, -1L, "view"))
      q.processAllAvailable()

      val all = spark.table("look_users")
      // the sentinel user itself finalizes as a straggler (first seen
      // after c4) — assert it is look-neutral, then compare the real
      // users; obfLooks below runs over ALL emitted rows, proving the
      // enrollment filter excludes stragglers
      val straggler = all.filter(col("user_id") === -1L).collect()
      assert(straggler.forall(_.getAs[Long]("first_t") > cuts(3)),
        "straggler sentinel must carry first_t > c4")
      val perUserStream = all.filter(col("user_id") =!= -1L)
      // batch twin of the per-user finalization, q316's arithmetic
      val perUserBatch = ev
        .select(col("user_id").cast("long").as("user_id"),
          unix_micros(col("ts")).as("tus"), col("event_type"))
        .groupBy(col("user_id"))
        .agg(min(col("tus")).as("first_t"), (1 to 4).map(k =>
          sum(when(col("event_type") === "purchase" &&
            col("tus") <= cuts(k - 1), 1L).otherwise(0L)).as(s"p$k")): _*)
        .withColumn("is_a",
          substring(md5(col("user_id").cast("string")), 1, 1) < "8")
        .select("user_id", "is_a", "first_t", "p1", "p2", "p3", "p4")
      val cols = perUserBatch.columns.map(col)
      val onlyStream = perUserStream.select(cols: _*).except(perUserBatch)
        .collect().toSeq
      val onlyBatch = perUserBatch.except(perUserStream.select(cols: _*))
        .collect().toSeq
      assert(onlyStream.isEmpty && onlyBatch.isEmpty,
        "stream-finalized per-user rows diverge from the batch derivation" +
          s"\n  only in stream (${onlyStream.size}): ${onlyStream.take(5)}" +
          s"\n  only in batch  (${onlyBatch.size}): ${onlyBatch.take(5)}")

      val got = LookStream.obfLooks(all, cuts).collect().toSeq
      val want = graft.queries.ExperimentQueries
        .q316SequentialLooks(spark, sfDir).collect().toSeq
      assert(got == want,
        s"looks diverge:\n  stream: $got\n  batch:  $want")
    } finally q.stop()
  }
}
