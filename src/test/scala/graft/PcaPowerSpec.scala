package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EmbedStatsQueries

/** q126 PCA power iteration: invariants plus an in-memory reference replay
  * of the same three-round algorithm in plain double arithmetic (the 12-dp
  * grid makes the distributed run differ from the float reference by at
  * most a few grid ulps per round).
  */
class PcaPowerSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val rows =
    EmbedStatsQueries.q126PcaPower(spark, sfDir).collect()

  test("q126 shape and pivot invariants") {
    assert(rows.length == 64)
    val loadings = rows.map(_.getAs[Double]("loading"))
    // ∞-norm normalization: the signed pivot component is exactly 1.0,
    // everything else is within [-1, 1]
    assert(loadings.count(_ == 1.0) >= 1, "pivot component must be exactly 1.0")
    assert(loadings.forall(l => l >= -1.0 && l <= 1.0))
    val lambda = rows.head.getAs[Double]("lambda_inf")
    assert(rows.forall(_.getAs[Double]("lambda_inf") == lambda))
    assert(lambda > 0.0, "top covariance eigenvalue estimate must be positive")
  }

  test("q126 matches an in-memory double-arithmetic replay to grid tolerance") {
    import org.apache.spark.sql.functions._
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(transform(col("embedding"), x => round(x.cast("double"), 6))
        .as("vv"))
      .collect().map(_.getSeq[Double](0).toArray)
    val dim = 64
    val n = vecs.length.toDouble
    val mean = Array.tabulate(dim)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      vecs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j)
    }
    var v = Array.fill(dim)(0.125)
    var m = 0.0
    for (_ <- 1 to 3) {
      val y = Array.tabulate(dim)(i =>
        (0 until dim).map(j => cov(i)(j) * v(j)).sum)
      val p = y.indices.maxBy(i => (math.abs(y(i)), -i))
      m = y(p)
      v = y.map(_ / m)
    }
    val got = rows.map(_.getAs[Double]("loading"))
    v.indices.foreach { i =>
      assert(math.abs(got(i) - v(i)) < 1e-5,
        s"dim ${i + 1}: distributed ${got(i)} vs reference ${v(i)}")
    }
    assert(math.abs(rows.head.getAs[Double]("lambda_inf") - m) < 1e-5)
  }
}
