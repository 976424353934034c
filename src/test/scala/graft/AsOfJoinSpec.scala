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

  test("caller-owned _t/_side/_p columns survive the join untouched") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 12:00:00"), "keep-t", 9L))
      .toDF("k", "id", "t", "_t", "_p") // working names already taken
    val right = Seq((1L, ts("2024-01-01 10:00:00"), "match"))
      .toDF("k", "rt", "tag")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t", "rt", Seq("tag"))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("_t") == "keep-t")
    assert(out.head.getAs[Long]("_p") == 9L)
    assert(out.head.getAs[String]("tag") == "match")
  }

  test("NULL payload values propagate; all payload columns come from the same right row") {
    // The 11:00 right row carries tag=NULL: a per-column fill would backfill
    // tag from the OLDER 10:00 row, mixing two right rows' columns. The
    // as-of match for the 12:00 left row is the 11:00 row — tag must be
    // NULL and v must be 7, together.
    val left = Seq((1L, 100L, ts("2024-01-01 12:00:00")))
      .toDF("k", "id", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option("early"), Option(5)),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[String], Option(7))
    ).toDF("k", "rt", "tag", "v")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t", "rt", Seq("tag", "v"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("tag") == null, "NULL payload must not be backfilled")
    assert(out(0).getAs[Int]("v") == 7)
  }

  test("all-NULL right payload row still wins over older rows") {
    val left = Seq((1L, 100L, ts("2024-01-01 12:00:00"))).toDF("k", "id", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Option("early")),
      (1L, ts("2024-01-01 11:00:00"), Option.empty[String])
    ).toDF("k", "rt", "tag")
    val out = AsOfJoin.joinAsOf(left, right, "k", "t", "rt", Seq("tag")).collect()
    assert(out.length == 1 && out(0).getAs[String]("tag") == null)
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
