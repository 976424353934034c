package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EstimateQueries

/** q379's federation contract: all nine deciles present with four
  * shards each, both quantile curves monotone, the error column is
  * exactly |merged − true|, and the true deciles match an independent
  * exact recomputation off the raw table. */
class QuantileMergeSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = EstimateQueries
    .q379QuantileMergeErr(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("decile"))

  test("nine deciles, four shards, monotone curves, error identity") {
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 9L))
    rows.foreach(r => assert(r.getAs[Long]("n_shards") == 4L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("true_value") <=
          b.getAs[Double]("true_value") + 1e-9)
        assert(a.getAs[Double]("merged_value") <=
          b.getAs[Double]("merged_value") + 1e-9)
      case _ =>
    }
    rows.foreach { r =>
      val e = math.abs(r.getAs[Double]("merged_value") -
        r.getAs[Double]("true_value"))
      assert(math.abs(r.getAs[Double]("abs_error") - e) <= 2e-6, r.toString)
    }
  }

  test("true deciles match an independent exact recomputation") {
    val cents = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("o_totalprice") * 100)
        .cast("long").as("c"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length
    rows.foreach { r =>
      val p = r.getAs[Long]("decile").toInt
      val k = (p * n + 9) / 10 // ceil(p*n/10)
      val expected = cents(k - 1) / 100.0
      assert(math.abs(r.getAs[Double]("true_value") - expected) <= 1e-6,
        s"decile $p: ${r.getAs[Double]("true_value")} vs $expected")
    }
  }
}
