package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.InfoQueries

/** q353's metric contract on a CONSTRUCTED census (the oracle hash
  * certifies arithmetic parity on the real tables; this spec certifies
  * the metric's defining property): translating a distribution by d
  * must cost W₁ = d exactly — the property KL/JS/PSI lack — and the KS
  * column must equal the max CDF gap. */
class WassersteinSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val rows = {
    val dir = Files.createTempDirectory("graft-w1")
    Seq((0, "AAA"), (1, "BBB"), (2, "CCC"))
      .toDF("n_nationkey", "n_name")
      .write.parquet(s"$dir/nation.parquet")
    Seq((1, 0), (2, 1), (3, 2))
      .toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$dir/supplier.parquet")
    // AAA: {1,1,2,2}; BBB = AAA shifted by +2: {3,3,4,4}; CCC uniform
    (Seq(1, 1, 2, 2).map((1, _)) ++ Seq(3, 3, 4, 4).map((2, _)) ++
      Seq(1, 2, 3, 4).map((3, _)))
      .toDF("l_suppkey", "l_quantity")
      .write.parquet(s"$dir/lineitem.parquet")
    InfoQueries.q353WassersteinMatrix(spark, dir.toString).collect()
      .map(r => (r.getAs[String]("nation_a"), r.getAs[String]("nation_b"))
        -> r).toMap
  }

  test("a pure translation by 2 quantity units costs exactly W1 = 2") {
    val r = rows(("AAA", "BBB"))
    assert(r.getAs[Double]("w1_qty") == 2.0)
    assert(r.getAs[Double]("ks_qty") == 1.0, "disjoint supports: KS = 1")
  }

  test("both endpoints sit at W1 = 1 from the uniform middle") {
    assert(rows(("AAA", "CCC")).getAs[Double]("w1_qty") == 1.0)
    assert(rows(("BBB", "CCC")).getAs[Double]("w1_qty") == 1.0)
    assert(rows(("AAA", "CCC")).getAs[Double]("ks_qty") == 0.5)
  }

  test("the matrix is the full a<b triangle") {
    assert(rows.keySet ==
      Set(("AAA", "BBB"), ("AAA", "CCC"), ("BBB", "CCC")))
  }
}
