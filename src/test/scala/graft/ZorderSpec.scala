package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ShardQueries

/** q355's layout contract (the oracle hash certifies the arithmetic;
  * this spec certifies the trade the audit exists to demonstrate): each
  * dedicated sort wins its own dimension, and the z-order layout beats
  * BOTH linear layouts on the mixed workload. */
class ZorderSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = ShardQueries.q355ZorderSkip(spark, sfDir)
    .collect().map(r => r.getAs[String]("layout") -> r).toMap

  test("all three layouts produce the full 64-file assignment") {
    assert(rows.keySet == Set("1_by_date", "2_by_part", "3_zorder"))
    rows.values.foreach(r => assert(r.getAs[Long]("n_files") == 64L))
  }

  test("each dedicated sort is the best layout for its own dimension") {
    def d(l: String) = rows(l).getAs[Double]("avg_files_date_probe")
    def p(l: String) = rows(l).getAs[Double]("avg_files_part_probe")
    assert(d("1_by_date") <= d("3_zorder") && d("3_zorder") <= d("2_by_part"))
    assert(p("2_by_part") <= p("3_zorder") && p("3_zorder") <= p("1_by_date"))
  }

  test("z-order wins the mixed workload against both linear sorts") {
    def c(l: String) = rows(l).getAs[Double]("avg_files_combined")
    assert(c("3_zorder") < c("1_by_date"))
    assert(c("3_zorder") < c("2_by_part"))
  }
}
