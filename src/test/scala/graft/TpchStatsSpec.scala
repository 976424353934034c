package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Kpis, StatsQueries, TpchQueries}

/** TPC-H-shape join analytics (q67/q68) and grouped statistics
  * (q69 OLS trend, q70 MAD outliers). */
class TpchStatsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q67 top-10 is revenue-ordered with pushed date filters") {
    val df = TpchQueries.q67ShippingPriority(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.map(_.getAs[Double]("revenue")).sliding(2).foreach {
      case Array(hi, lo) => assert(hi >= lo, "revenue order broken")
      case _ =>
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan"),
      s"order-date filter not pushed:\n$plan")
    assert(plan.contains(
      "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual"),
      s"ship-date filter not pushed:\n$plan")
  }

  test("q68 sums match an independently-computed nation total") {
    val rows = TpchQueries.q68LocalSupplierVolume(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 5) // ASIA has 5 nations
    rows.map(_.getAs[Double]("revenue")).sliding(2).foreach {
      case Array(hi, lo) => assert(hi >= lo)
      case _ =>
    }
    // independent recompute of one nation via a different plan (filters
    // applied post-join on the raw tables)
    val name = rows.head.getAs[String]("n_name")
    val c = Kpis.table(spark, sfDir, "customer")
    val o = Kpis.table(spark, sfDir, "orders")
    val l = Kpis.table(spark, sfDir, "lineitem")
    val s = Kpis.table(spark, sfDir, "supplier")
    val n = Kpis.table(spark, sfDir, "nation")
    val expected = c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === name &&
        col("c_nationkey") === col("s_nationkey") &&
        year(col("o_orderdate")) === 1997)
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double"))
      .head().getDouble(0)
    assert(rows.head.getAs[Double]("revenue") == expected)
  }

  test("q69 slope/intercept match an exact BigDecimal recompute") {
    val rows = StatsQueries.q69TrendFit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val et = rows.head.getAs[String]("event_type")
    val pts = Kpis.eventsTable(spark, sfDir)
      .filter(col("event_type") === et)
      .select(((col("ts").cast("long") - 1704067200L) / lit(3600L))
        .cast("long").as("x"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("x"), BigDecimal(r.getAs[Double]("value"))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    val n = BigDecimal(pts.length)
    val sx = BigDecimal(pts.map(_._1).sum)
    val sxx = BigDecimal(pts.map(p => p._1 * p._1).sum)
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._2 * BigDecimal(p._1)).sum
    val slope = ((n * sxy - sx * sy).toDouble) /
      ((n * sxx - sx * sx).toDouble)
    val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    val got = rows.head
    assert(got.getAs[Double]("slope") == slope, "slope mismatch")
    assert(got.getAs[Double]("intercept") == intercept, "intercept mismatch")
  }

  test("q71 bins are balanced, ordered, and partition each type") {
    val rows = graft.queries.ReshapeQueries.q71QuartileBins(spark, sfDir)
      .collect()
    val total = Kpis.eventsTable(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("bin"))
      assert(sorted.map(_.getAs[Int]("bin")).toSeq == (1 to 4))
      val ns = sorted.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1, s"$et bins unbalanced: ${ns.toSeq}")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"),
            s"$et bins overlap")
        case _ =>
      }
    }
  }

  test("q72 matches the built-in corr estimate") {
    val rows = graft.queries.ReshapeQueries.q72ExactCorr(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val builtin = Kpis.table(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("c"))
      .toMap
    rows.foreach { r =>
      val c = r.getAs[Double]("corr_qty_price")
      assert(c >= -1.0 && c <= 1.0)
      assert(math.abs(c - builtin(r.getAs[String]("l_returnflag"))) < 1e-9,
        "closed form diverges from built-in corr")
    }
  }

  test("q73 pivot cells sum to the event total with no negative cells") {
    val rows = graft.queries.ReshapeQueries.q73DailyPivot(spark, sfDir)
      .collect()
    val total = Kpis.eventsTable(spark, sfDir).count()
    val cells = rows.flatMap(r => Seq("click", "error", "purchase",
      "signup", "view").map(r.getAs[Long]))
    assert(cells.forall(_ >= 0L))
    assert(cells.sum == total)
  }

  test("q74 growth is consistent with consecutive revenue rows") {
    val rows = graft.queries.ReshapeQueries.q74DodGrowth(spark, sfDir)
      .collect()
    assert(rows.head.isNullAt(rows.head.fieldIndex("dod_growth")))
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        val expected = (cur.getAs[Double]("revenue") -
          prev.getAs[Double]("revenue")) / prev.getAs[Double]("revenue")
        assert(cur.getAs[Double]("prev_revenue") ==
          prev.getAs[Double]("revenue"))
        assert(cur.getAs[Double]("dod_growth") == expected)
      case _ =>
    }
  }

  test("q70 outlier counts agree with a direct ungrouped recount") {
    val rows = StatsQueries.q70MadOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("mad") >= 0.0)
      val share = r.getAs[Double]("outlier_share")
      assert(share >= 0.0 && share < 0.5, "MAD flags a minority by design")
      // independent recount using the reported median/mad, no grouping
      val direct = Kpis.eventsTable(spark, sfDir)
        .filter(col("event_type") === r.getAs[String]("event_type"))
        .filter(abs(col("value") - lit(r.getAs[Double]("median"))) >
          lit(3.0) * lit(r.getAs[Double]("mad")))
        .count()
      assert(direct == r.getAs[Long]("n_outliers"),
        s"${r.getAs[String]("event_type")} recount mismatch")
    }
  }
}
