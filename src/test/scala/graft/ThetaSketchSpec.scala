package graft

import java.nio.file.Files
import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EstimateQueries

/** q357's sketch contract on CONSTRUCTED supply histories (the oracle
  * hash certifies arithmetic parity; this spec certifies the branch
  * semantics): sides under k are stored whole, so every estimate —
  * including intersection and Jaccard — turns EXACT; sides over k take
  * the threshold path and must land near truth. */
class ThetaSketchSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def run(aParts: Range, bParts: Range) = {
    val dir = Files.createTempDirectory("graft-theta")
    val d95 = Date.valueOf("1995-06-01"); val d96 = Date.valueOf("1996-06-01")
    (aParts.map(p => (d95, p, 1)) ++ bParts.map(p => (d96, p, 1)))
      .toDF("l_shipdate", "l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    EstimateQueries.q357ThetaSketchCert(spark, dir.toString).head()
  }

  test("sides under k store the whole set: every estimate is exact") {
    // A = parts 1..100, B = 71..150 — overlap 30, union 150
    val r = run(1 to 100, 71 to 150)
    assert(r.getAs[Long]("n_exact_a") == 100L &&
      r.getAs[Long]("n_exact_b") == 80L &&
      r.getAs[Long]("n_exact_int") == 30L)
    assert(r.getAs[Double]("est_a") == 100.0)
    assert(r.getAs[Double]("est_b") == 80.0)
    assert(r.getAs[Double]("est_int") == 30.0)
    assert(r.getAs[Double]("est_union") == 150.0)
    assert(r.getAs[Double]("jaccard_est") == r.getAs[Double]("jaccard_exact"))
  }

  test("sides over k take the threshold path and land near truth") {
    // A = 1..300, B = 151..450 — overlap 150, union 450; k = 256
    val r = run(1 to 300, 151 to 450)
    def near(est: Double, truth: Double, tol: Double) =
      assert(math.abs(est - truth) / truth < tol,
        s"estimate $est too far from $truth")
    near(r.getAs[Double]("est_a"), 300.0, 0.2)
    near(r.getAs[Double]("est_b"), 300.0, 0.2)
    near(r.getAs[Double]("est_int"), 150.0, 0.35)
    near(r.getAs[Double]("est_union"), 450.0, 0.2)
  }
}
