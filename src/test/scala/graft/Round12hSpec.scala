package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-12i queries (q289–). */
class Round12hSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q289: every surviving order exceeds the threshold exactly once") {
    val rows = queries.Tpch7Queries.q289LargeOrders(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(_.getAs[Long]("o_orderkey"))
    assert(keys.distinct.length == keys.length, "orderkey emitted twice")
    rows.foreach { r =>
      assert(r.getAs[Double]("total_qty") > 250.0,
        s"order ${r.getAs[Long]("o_orderkey")} under threshold")
    }
    // descending by total_qty (ties broken by orderkey): the emitted order
    val qtys = rows.map(_.getAs[Double]("total_qty"))
    assert(qtys.zip(qtys.tail).forall { case (a, b) => a >= b })
  }

  test("q289: survivor set matches an independent recount") {
    import org.apache.spark.sql.functions._
    val expected = queries.Kpis.table(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey")).agg(sum("l_quantity").as("s"))
      .filter(col("s") > 250.0).count()
    val got = queries.Tpch7Queries.q289LargeOrders(spark, sfDir).count()
    assert(got == expected, s"$got vs $expected")
  }

  test("q290: one row; revenue bounded by unfiltered quantity-sliced revenue") {
    import org.apache.spark.sql.functions._
    val r = queries.Tpch7Queries.q290DisjunctRevenue(spark, sfDir).collect()
    assert(r.length == 1)
    val rev = r.head.getAs[Double]("revenue")
    val n = r.head.getAs[Long]("n_items")
    assert(n > 0 && rev > 0)
    // upper bound: all lineitems in the quantity envelope, any brand/size
    val cap = queries.Kpis.table(spark, sfDir, "lineitem")
      .filter(col("l_quantity").between(1, 30))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
      .collect().head.getDouble(0)
    assert(rev <= cap + 1e-6, s"$rev > cap $cap")
  }
}
