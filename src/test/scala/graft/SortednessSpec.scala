package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ShardQueries

/** q376's diagnostic contract: Spearman rho is a genuine correlation
  * (bounded, exact-rank-based), the verdict is a pure function of rho,
  * and a column ranked by the arrival key itself scores rho = 1 (the
  * identity check, run on a constructed frame through the same rank
  * machinery). */
class SortednessSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows =
    ShardQueries.q376SortednessAudit(spark, sfDir).collect()

  test("all four audited columns present; rho bounded; verdict pure") {
    assert(rows.map(_.getAs[String]("column_name")).toSet ==
      Set("l_extendedprice", "l_partkey", "l_quantity", "l_shipdate"))
    rows.foreach { r =>
      val rho = r.getAs[Double]("spearman_rho")
      assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9, r.toString)
      val expected =
        if (math.abs(rho) > 0.95) "sorted"
        else if (math.abs(rho) > 0.5) "clustered"
        else "shuffled"
      assert(r.getAs[String]("verdict") == expected, r.toString)
      assert(r.getAs[Long]("n_rows") > 0)
    }
  }

  test("rank identity: a column equal to the arrival key scores rho 1") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1, 1001).select(
      col("id").as("l_orderkey"), lit(1).as("l_linenumber"),
      col("id").as("k"))
    val ra = graft.operators.RangeRank.withGlobalRank(df, "ra",
      Seq(col("l_orderkey"), col("l_linenumber")))
    val d2 = graft.operators.RangeRank.withGlobalRank(ra, "rv",
      Seq(col("k"), col("ra")))
      .select(((col("rv") - col("ra")) * (col("rv") - col("ra")))
        .as("d2"))
      .agg(sum(col("d2"))).collect().head.getLong(0)
    assert(d2 == 0L, "identical orders must have zero rank displacement")
  }
}
