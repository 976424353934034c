package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ShardQueries

/** q420's planning contract: every dimension broadcasts at fixture
  * scale; the fixed-cardinality dims (region 5, nation 25 — scale-
  * factor invariants) still broadcast at 1000× with UNCHANGED bytes,
  * while the scaling wide dims (customer, part) leave broadcast range
  * — the measured ledger behind the library's broadcast conventions. */
class BroadcastLedgerSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val byTable = ShardQueries.q420BroadcastLedger(spark, sfDir)
    .collect().map(r => r.getAs[String]("table_name") -> r).toMap

  test("fixed dims broadcast forever; scaling wide dims do not") {
    assert(byTable("region").getAs[Long]("n_rows") == 5L)
    assert(byTable("nation").getAs[Long]("n_rows") == 25L)
    Seq("region", "nation").foreach { t =>
      val r = byTable(t)
      assert(r.getAs[Boolean]("broadcast_ok_1000x"), r.toString)
      assert(r.getAs[Long]("est_bytes_1000x") == r.getAs[Long]("est_bytes"),
        s"fixed-cardinality tables do not grow with SF: $r")
    }
    Seq("customer", "part", "supplier").foreach { t =>
      val r = byTable(t)
      assert(r.getAs[Long]("est_bytes_1000x") ==
        1000L * r.getAs[Long]("est_bytes"),
        s"scaling tables grow linearly with SF: $r")
      assert(r.getAs[Boolean]("broadcast_ok_1000x") ==
        (r.getAs[Long]("est_bytes_1000x") <= 10L * 1024 * 1024),
        s"the 1000x verdict must follow the projected bytes: $r")
    }
  }

  test("every dim broadcasts at fixture scale; byte accounting sane") {
    byTable.values.foreach { r =>
      assert(r.getAs[Boolean]("broadcast_ok"), r.toString)
      val bpr = r.getAs[Double]("bytes_per_row")
      assert(bpr > 8.0 && bpr < 200.0, r.toString)
      assert(math.abs(bpr - r.getAs[Long]("est_bytes").toDouble /
        r.getAs[Long]("n_rows")) < 1e-6, r.toString)
    }
  }
}
