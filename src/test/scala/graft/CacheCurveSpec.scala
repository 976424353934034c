package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ShardQueries

/** q383's curve contract: hit share is monotone in cache size, always
  * at least the cache's key fraction (the hottest keys can never serve
  * LESS than a uniform slice), bounded by 1, and the cut ranks are the
  * exact ceil(f*K) thresholds. */
class CacheCurveSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = ShardQueries.q383CacheHitCurve(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("cache_pct"))

  test("four cache sizes, monotone hit shares, exact cut ranks") {
    assert(rows.map(_.getAs[Long]("cache_pct")).toSeq ==
      Seq(1L, 5L, 10L, 25L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hit_share") <=
          b.getAs[Double]("hit_share") + 1e-9)
      case _ =>
    }
    rows.foreach { r =>
      val k = r.getAs[Long]("n_keys")
      val f = r.getAs[Long]("cache_pct")
      assert(r.getAs[Long]("cache_keys") == (f * k + 99) / 100, r.toString)
      val share = r.getAs[Double]("hit_share")
      assert(share <= 1.0 + 1e-9)
      // hottest-first prefix dominates the uniform slice it replaces
      assert(share >= r.getAs[Long]("cache_keys").toDouble / k - 1e-6,
        s"hot prefix must beat a uniform slice: $r")
    }
  }
}
