package graft

import java.nio.file.Files
import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SeriesQueries

/** q354's alignment contract on a CONSTRUCTED monthly census (the
  * oracle hash certifies fold parity on the real tables; this spec
  * certifies DTW's defining property): a tempo-stretched copy costs 0
  * — the case every point-wise distance gets wrong — a constant level
  * offset costs exactly offset × steps, and an asymmetric pair matches
  * the hand-computed DP table. */
class DtwSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val rows = {
    val dir = Files.createTempDirectory("graft-dtw")
    Seq((0, "AAA"), (1, "BBB"), (2, "CCC"))
      .toDF("n_nationkey", "n_name")
      .write.parquet(s"$dir/nation.parquet")
    Seq((1, 0), (2, 1), (3, 2))
      .toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    val mon = (m: Int) => Date.valueOf(f"2020-0$m%d-01")
    // AAA [10,20,30,30]; BBB [10,10,20,30] = AAA tempo-stretched
    // (each holds one value a month longer at a different spot);
    // CCC = AAA + 5 flat
    val series = Seq(
      1 -> Seq(10.0, 20.0, 30.0, 30.0),
      2 -> Seq(10.0, 10.0, 20.0, 30.0),
      3 -> Seq(15.0, 25.0, 35.0, 35.0))
    series.flatMap { case (ck, vs) =>
      vs.zipWithIndex.map { case (v, i) => (ck, mon(i + 1), v) }
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    SeriesQueries.q354DtwMatrix(spark, dir.toString).collect()
      .map(r => (r.getAs[String]("nation_a"), r.getAs[String]("nation_b"))
        -> r).toMap
  }

  test("a tempo-stretched copy is DTW-identical (the warping property)") {
    assert(rows(("AAA", "BBB")).getAs[Long]("dtw_cents") == 0L,
      "pointwise distance would be 2000 cents; the warp absorbs it all")
  }

  test("a flat +5 level offset costs exactly 4 x 500 cents") {
    val r = rows(("AAA", "CCC"))
    assert(r.getAs[Long]("dtw_cents") == 2000L)
    assert(r.getAs[Double]("dtw_dollars") == 20.0)
  }

  test("an asymmetric pair reproduces the hand-computed DP table") {
    // DP over |[10,10,20,30] - [15,25,35,35]| ends at 25 dollars
    assert(rows(("BBB", "CCC")).getAs[Long]("dtw_cents") == 2500L)
  }
}
