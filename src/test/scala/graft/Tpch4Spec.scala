package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Tpch4Queries

/** TPC-H Q8/Q13 shapes (q121/q122): value pins at sf0.001 plus the
  * plan-shape properties each query's scaladoc promises.
  */
class Tpch4Spec extends AnyFunSuite {
  import SparkTestSession._

  test("q121 market share: shares in [0,1], numerator consistent with totals") {
    val rows = Tpch4Queries.q121MarketShare(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // years restricted to the filter window, ascending
    val years = rows.map(_.getAs[Long]("o_year"))
    assert(years.sameElements(years.sorted))
    assert(years.forall(y => y == 1996L || y == 1997L))
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0, s"share out of range: $share")
      assert(r.getAs[Double]("total_volume") > 0.0)
    }
  }

  test("q121 plan: date filter pushed to orders scan; nation/region broadcast") {
    val df = Tpch4Queries.q121MarketShare(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val ordersScan = scans.find(_.contains("orders.parquet")).getOrElse("")
    assert(ordersScan.contains("PushedFilters") &&
      ordersScan.contains("o_orderdate"),
      s"orders date predicate not pushed:\n$ordersScan")
    // part scan prunes to the one join column after the type filter
    val partScan = scans.find(_.contains("part.parquet")).getOrElse("")
    assert(partScan.contains("p_type"), s"p_type filter not pushed:\n$partScan")
    assert(plan.contains("BroadcastHashJoin"), "no broadcast dim join in plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q122 distribution: masses sum to |customer|, zero bucket counted") {
    val rows = Tpch4Queries.q122OrderCountDist(spark, sfDir).collect()
    val nCust = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust,
      "distribution masses must partition the customer set")
    // custdist strictly ordered as requested: desc by mass, ties desc by k
    val pairs = rows.map(r => (r.getAs[Long]("custdist"), r.getAs[Long]("c_count")))
    assert(pairs.sameElements(pairs.sortBy { case (d, k) => (-d, -k) }))
  }

  test("q122 left-outer semantics: urgent-only customers land in the zero bucket") {
    import org.apache.spark.sql.functions._
    // customers whose every order is 1-URGENT (or who have none) must be
    // counted at c_count=0; an inner-join regression would drop them.
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val urgentOnly = c.join(
      o.groupBy("o_custkey")
        .agg(max(when(col("o_orderpriority") =!= "1-URGENT", 1).otherwise(0))
          .as("has_nonurgent")),
      col("c_custkey") === col("o_custkey"), "left_outer")
      .filter(col("has_nonurgent").isNull || col("has_nonurgent") === 0)
      .count()
    val zeroBucket = Tpch4Queries.q122OrderCountDist(spark, sfDir)
      .filter(col("c_count") === 0).collect()
      .headOption.map(_.getAs[Long]("custdist")).getOrElse(0L)
    assert(zeroBucket == urgentOnly,
      s"zero bucket $zeroBucket != urgent-only customer count $urgentOnly")
  }

  test("q122 plan: priority filter pushed into the orders scan") {
    val df = Tpch4Queries.q122OrderCountDist(spark, sfDir)
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val ordersScan = scans.find(_.contains("orders.parquet")).getOrElse("")
    assert(ordersScan.contains("o_orderpriority"),
      s"priority predicate not pushed:\n$ordersScan")
  }
}
