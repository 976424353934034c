package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BacklogStream

/** Keyed live backlog counter (q318's streaming twin): static
  * equivalence with the groupBy flow ledger, and state carry across
  * micro-batches. */
class BacklogStreamSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  /** q318's boundary stream keyed by nation: +1 at open, −1 the day
    * after the last shipment (same clamp as the batch ledger). */
  private def nationBounds = {
    val closes = queries.Kpis.table(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("closed"))
    val spans = queries.Kpis.table(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("opened"))
      .join(closes, col("o_orderkey") === col("l_orderkey"))
      .join(queries.Kpis.table(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("shard"), col("opened"),
        greatest(col("closed"), col("opened")).as("closed"))
    spans.select(col("shard"), col("opened").cast("timestamp").as("ts"),
        lit(1L).as("delta"))
      .unionAll(spans.select(col("shard"),
        date_add(col("closed"), 1).cast("timestamp").as("ts"),
        lit(-1L).as("delta")))
  }

  test("static levels equal the groupBy flow ledger, and drain to zero") {
    val got = BacklogStream.levels(nationBounds).collect()
      .map(l => l.shard -> l).toMap
    val expected = nationBounds.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("delta") > 0, 1L).otherwise(0L)).as("op"),
        sum(when(col("delta") < 0, 1L).otherwise(0L)).as("cl"))
      .collect()
      .map(r => r.getAs[Int]("shard") ->
        (r.getAs[Long]("n"), r.getAs[Long]("op"), r.getAs[Long]("cl")))
      .toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    got.foreach { case (shard, l) =>
      val (n, op, cl) = expected(shard)
      assert(l.batch_rows == n && l.opened == op && l.closed == cl)
      // every order closes, so the one-batch backlog drains to zero
      assert(l.backlog == op - cl && l.backlog == 0L,
        s"shard $shard backlog ${l.backlog}")
    }
  }

  test("streaming: backlog carries across micro-batches per shard") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[BacklogStream.Bound]
    val q = BacklogStream.levels(mem.toDF())
      .writeStream.format("memory").queryName("backlog_out")
      .outputMode(OutputMode.Append()).start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    try {
      // batch 1: shard 1 opens 3 closes 1 → 2; shard 2 opens 1 → 1
      mem.addData(
        BacklogStream.Bound(1, ts(10), 1L),
        BacklogStream.Bound(1, ts(11), 1L),
        BacklogStream.Bound(1, ts(12), 1L),
        BacklogStream.Bound(1, ts(13), -1L),
        BacklogStream.Bound(2, ts(10), 1L))
      q.processAllAvailable()
      val b1 = spark.table("backlog_out").as[BacklogStream.Level]
        .collect().map(l => l.shard -> l.backlog).toMap
      assert(b1 == Map(1 -> 2L, 2 -> 1L))
      // batch 2: shard 1 closes 2 → 0; shard 2 opens 1 → 2 (state carried)
      mem.addData(
        BacklogStream.Bound(1, ts(20), -1L),
        BacklogStream.Bound(1, ts(21), -1L),
        BacklogStream.Bound(2, ts(20), 1L))
      q.processAllAvailable()
      val rows = spark.table("backlog_out").as[BacklogStream.Level]
        .collect()
      assert(rows.length == 4)
      // batch-2 rows: shard 1 closed 2 (carried 2 → 0); shard 2 opened 1
      // on carried state 1 → 2
      assert(rows.exists(l => l.shard == 1 && l.batch_rows == 2 &&
        l.closed == 2 && l.backlog == 0L))
      assert(rows.exists(l => l.shard == 2 && l.batch_rows == 1 &&
        l.opened == 1 && l.backlog == 2L))
    } finally q.stop()
  }
}
