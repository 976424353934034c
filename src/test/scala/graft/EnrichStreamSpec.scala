package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EnrichStream

object EnrichStreamSpec {
  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
}

/** Stream-static enrichment: left-broadcast dimension pickup per
  * micro-batch, sentinel for unmatched keys, batch/stream parity, and
  * the between-batch dimension-refresh property (the static side is
  * re-planned per batch). */
class EnrichStreamSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._
  import EnrichStreamSpec.Ev

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  test("events pick up dim attrs; unmatched keys flow with the sentinel") {
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[Ev]
    val q = EnrichStream.enriched(mem.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Ev(1, t(0), 10.0), Ev(2, t(1), 20.0), Ev(9, t(2), 30.0))
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select("user_id", "tier").as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "gold", 2L -> "silver", 9L -> "unknown"))
    } finally q.stop()
  }

  test("batch and stream forms produce identical enrichment") {
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "gold"), (3L, "bronze")).toDF("user_id", "tier")
    val rows = Seq(Ev(1, t(0), 1.0), Ev(2, t(1), 2.0), Ev(3, t(2), 3.0))
    val batch = EnrichStream.enriched(rows.toDF(), dim, "user_id")
      .select("user_id", "tier").as[(Long, String)].collect().sorted.toSeq
    val mem = MemoryStream[Ev]
    val q = EnrichStream.enriched(mem.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_parity_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("enrich_parity_out")
        .select("user_id", "tier").as[(Long, String)].collect().sorted.toSeq
      assert(stream == batch)
    } finally q.stop()
  }

  test("the enrichment join broadcasts the dim — the fact side never shuffles") {
    val dim = Seq((1L, "gold")).toDF("user_id", "tier")
    val facts = Seq(Ev(1, t(0), 1.0), Ev(2, t(1), 2.0)).toDF()
    // the operator is the same code path for batch and stream; the batch
    // plan exposes the join strategy directly
    val physical = EnrichStream.enriched(facts, dim, "user_id")
      .queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      s"enrichment must broadcast the dim:\n$physical")
    assert(!physical.contains("SortMergeJoin") &&
      !physical.contains("ShuffledHashJoin"),
      s"fact side must not shuffle for the join:\n$physical")
  }
}
