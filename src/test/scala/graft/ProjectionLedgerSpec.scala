package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ShardQueries

/** q426's pruning contract: SELECT * reads exactly the full row (share
  * 1.0, saving 0), every pruned pattern reads strictly less, byte
  * masses add up (read ≤ full, saving = 1 − share), and patterns with
  * fewer/narrower columns read less than wider ones. */
class ProjectionLedgerSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val byPattern = ShardQueries.q426ProjectionLedger(spark, sfDir)
    .collect().map(r => r.getAs[String]("access_pattern") -> r).toMap

  test("select_star is the identity row; pruned patterns read less") {
    val star = byPattern("select_star")
    assert(star.getAs[Long]("bytes_read") == star.getAs[Long]("bytes_full"))
    assert(star.getAs[Double]("saving_share") == 0.0)
    byPattern.collect { case (k, r) if k != "select_star" => r }.foreach { r =>
      assert(r.getAs[Long]("bytes_read") < r.getAs[Long]("bytes_full"),
        s"a pruned projection must read strictly less: $r")
      assert(r.getAs[Double]("saving_share") > 0.0, r.toString)
    }
  }

  test("share arithmetic closes on every row") {
    byPattern.values.foreach { r =>
      val share = r.getAs[Double]("read_share")
      assert(math.abs(share + r.getAs[Double]("saving_share") - 1.0) < 1e-9,
        r.toString)
      assert(share > 0.0 && share <= 1.0, r.toString)
      assert(r.getAs[Long]("n_cols") <= 11L)
    }
    assert(byPattern("q7_pricing_summary").getAs[Long]("bytes_read") >
      byPattern("q1_daily_revenue").getAs[Long]("bytes_read"),
      "seven columns must out-read four of comparable width")
  }
}
