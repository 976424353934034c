package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join semantics: inclusivity at equal timestamps, unmatched lefts,
  * per-key isolation. */
class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("most recent right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 12:00:00")),
      (1L, 102L, ts("2024-01-01 09:00:00")), // before any right row
      (2L, 200L, ts("2024-01-01 12:00:00"))  // other key: no right rows
    ).toDF("k", "id", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), "at-ten"),   // equal ts → visible
      (1L, ts("2024-01-01 11:00:00"), "at-eleven")
    ).toDF("k", "rt", "tag")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t", "rt", Seq("tag"))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("tag")))
    assert(out.toSeq == Seq(
      (100L, "at-ten"),     // inclusive at equal timestamp
      (101L, "at-eleven"),  // latest earlier right row
      (102L, null),         // nothing at-or-before
      (200L, null)))        // key isolation
  }

  test("left row count is preserved (no range explosion)") {
    val left = (1 to 50).map(i => (1L, i.toLong, ts(f"2024-01-01 ${i % 24}%02d:30:00")))
      .toDF("k", "id", "t")
    val right = (1 to 20).map(i => (1L, ts(f"2024-01-01 ${i % 24}%02d:00:00"), s"r$i"))
      .toDF("k", "rt", "tag")
      // dedupe ties as the contract requires
      .dropDuplicates("k", "rt")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t", "rt", Seq("tag"))
    assert(out.count() == 50)
  }
}
