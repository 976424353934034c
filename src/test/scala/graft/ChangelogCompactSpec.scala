package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChangelogCompact

/** CDC changelog compaction: latest-wins, tombstone drops, arrival-order
  * independence, and the map-side-combinable plan shape. */
class ChangelogCompactSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  private def compact(rows: Seq[(Long, Int, String, String)]) =
    ChangelogCompact.compact(
        rows.toDF("k", "seq", "op", "v"),
        key = col("k"), seq = col("seq"), op = col("op"),
        payload = Seq("v"))
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Int]("last_seq"),
        r.getAs[String]("v"), r.getAs[Long]("n_versions")))
      .toSet

  test("latest version wins; tombstoned keys vanish; counts include all") {
    val log = Seq(
      (1L, 1, "U", "a"), (1L, 2, "U", "b"),          // update chain
      (2L, 1, "U", "x"), (2L, 2, "D", "x"),          // deleted
      (3L, 1, "U", "only"),                          // single insert
      (4L, 1, "U", "old"), (4L, 2, "D", "old"), (4L, 3, "U", "back"))
    assert(compact(log) == Set(
      (1L, 2, "b", 2L), (3L, 1, "only", 1L), (4L, 3, "back", 3L)))
  }

  test("result is independent of changelog arrival order") {
    val log = Seq(
      (1L, 3, "U", "final"), (1L, 1, "U", "first"), (1L, 2, "D", "mid"),
      (2L, 2, "D", "y"), (2L, 1, "U", "y"))
    assert(compact(log) == Set((1L, 3, "final", 3L)))
    assert(compact(log.reverse) == compact(log))
  }

  test("compaction plans as a partial-aggregating agg, not a window sort") {
    val qe = ChangelogCompact.q61CdcCompact(spark, sfDir).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Window"), "latest-wins must partial-aggregate")
    // struct max lowers to SortAggregate; the property that matters is the
    // map-side partial before the exchange
    assert(plan.contains("partial_max"), s"no map-side combine in:\n$plan")
  }

  test("duplicate seq ties break on the documented (op, payload) order") {
    // two rows at seq 2 for key 1: 'U'/"z" beats 'D'/"a" (op compares
    // first, 'U' > 'D') — the struct-max order the Scaladoc + oracle pin
    val log = Seq((1L, 1, "U", "a"), (1L, 2, "D", "a"), (1L, 2, "U", "z"))
    assert(compact(log) == Set((1L, 2, "z", 3L)))
  }

  test("assertUniqueSeq fails fast on a duplicate (key, seq) pair") {
    val dup = Seq((1L, 1, "U", "a"), (1L, 1, "U", "b")).toDF("k", "seq", "op", "v")
    val ok = Seq((1L, 1, "U", "a"), (1L, 2, "U", "b")).toDF("k", "seq", "op", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      ChangelogCompact.compact(df, key = col("k"), seq = col("seq"),
        op = col("op"), payload = Seq("v"), assertUniqueSeq = true).collect()
    assert(run(ok).length == 1)
    val e = intercept[Exception] { run(dup) }
    assert(e.getMessage.contains("duplicate") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate")),
      s"wrong failure: $e")
  }

  test("assertUniqueSeq names a NULL seq as such, not as a duplicate") {
    // countDistinct skips NULLs: a lone NULL seq is NOT a duplicate and
    // must fail with its own message (round-9 ADVICE fix)
    val withNull = Seq((1L, Option(1), "U", "a"), (1L, Option.empty[Int], "U", "b"))
      .toDF("k", "seq", "op", "v")
    val e = intercept[Exception] {
      ChangelogCompact.compact(withNull, key = col("k"), seq = col("seq"),
        op = col("op"), payload = Seq("v"), assertUniqueSeq = true).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("NULL seq")),
      s"expected the NULL-seq message, got: $e")
  }

  test("q61 snapshot honors the synthetic revision/delete pattern") {
    val rows = ChangelogCompact.q61CdcCompact(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Long]("orderkey")
      assert(k % 5 != 0, s"tombstoned key $k survived")
      if (k % 3 == 0) {
        assert(r.getAs[Int]("last_seq") == 2 &&
          r.getAs[String]("status") == "R", s"key $k missed its revision")
        assert(r.getAs[Long]("n_versions") == 2L)
      } else {
        assert(r.getAs[Int]("last_seq") == 1)
        assert(r.getAs[Long]("n_versions") == 1L)
      }
    }
  }
}
