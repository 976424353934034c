package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-12h queries (q256–). */
class Round12gSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q256: Theil decomposition closes and terms are ordered") {
    val r = queries.MarketQueries.q256TheilDecomposition(spark, sfDir)
      .collect().head
    val total = r.getAs[Double]("t_total")
    val between = r.getAs[Double]("t_between")
    val within = r.getAs[Double]("t_within_weighted")
    assert(total >= 0 && between >= 0 && within >= 0)
    assert(math.abs(r.getAs[Double]("decomposition_gap")) < 0.01,
      s"gap ${r.getAs[Double]("decomposition_gap")}")
    assert(between <= total + 1e-6)
  }

  test("q257: full pair matrix, JS within [0, ln 2]") {
    val rows = queries.InfoQueries.q257SourceJsMatrix(spark, sfDir).collect()
    val nSources = rows.flatMap(r =>
      Seq(r.getAs[String]("source_a"), r.getAs[String]("source_b")))
      .distinct.length
    assert(rows.length == nSources * (nSources - 1) / 2,
      s"${rows.length} pairs from $nSources sources")
    rows.foreach { r =>
      val js = r.getAs[Double]("js_nats")
      assert(js >= -1e-9 && js <= math.log(2.0) + 1e-9,
        s"${r.getAs[String]("source_a")}↔${r.getAs[String]("source_b")} js=$js")
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
  }

  test("q258: Hill alpha positive, k is the top decile, threshold positive") {
    val r = queries.StatsQueries.q258HillTailIndex(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n_customers")
    assert(r.getAs[Long]("k_tail") == n / 10)
    assert(r.getAs[Double]("threshold_spend") > 0)
    val alpha = r.getAs[Double]("hill_alpha")
    assert(alpha > 0 && alpha < 1000, s"alpha $alpha")
  }
}
