package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2

/** q413's lifecycle contract: a longer time-travel horizon can only
  * protect more versions (GC monotone non-increasing in R), live
  * versions are never GC-able and their count is horizon-independent
  * (= one open interval per tracked key), and GC + retained = total on
  * every row. */
class RetentionPlanSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = Scd2.q413RetentionPlan(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("retention_days"))

  test("GC monotone non-increasing in the horizon; accounting closes") {
    assert(rows.map(_.getAs[Long]("retention_days")).toSeq ==
      Seq(7L, 30L, 90L, 365L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("gc_versions") >= b.getAs[Long]("gc_versions"),
          s"a longer horizon cannot GC more: $a vs $b")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("gc_versions") + r.getAs[Long]("retained_versions")
        == r.getAs[Long]("n_versions"), r.toString)
      assert(r.getAs[Long]("gc_versions") <=
        r.getAs[Long]("n_versions") - r.getAs[Long]("n_live"),
        s"live versions must never be GC-able: $r")
    }
  }

  test("live count is one open interval per tracked key") {
    val liveCounts = rows.map(_.getAs[Long]("n_live")).distinct
    assert(liveCounts.size == 1, s"horizon-independent: $liveCounts")
    val keys = Scd2.q54PriorityScd2(spark, sfDir)
      .select(countDistinct(col("custkey"))).head().getLong(0)
    assert(liveCounts.head == keys,
      s"every tracked key has exactly one open interval: " +
        s"${liveCounts.head} vs $keys keys")
  }
}
