package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SplitQueries

/** q421's decay contract: one epoch is worth exactly its tokens
  * (efficiency 1.0), efficiency falls strictly with every doubling
  * (repeated data is worth less), effective tokens still RISE with E
  * (more epochs never hurt, they just pay less), and the asymptote
  * U·(1+R*) bounds every row. The per-epoch efficiency column is
  * lang-independent (the decay is epoch-level), so all langs share it. */
class EpochDecaySpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = SplitQueries.q421EpochDecay(spark, sfDir).collect()

  test("decay direction: efficiency strictly falls, value still rises") {
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val s = rs.sortBy(_.getAs[Long]("epochs"))
      assert(s.head.getAs[Double]("efficiency") == 1.0,
        s"$lang: one epoch is pure unique data: ${s.head}")
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("efficiency") >
            b.getAs[Double]("efficiency"), s"$lang: $a vs $b")
          assert(a.getAs[Double]("eff_tokens") <
            b.getAs[Double]("eff_tokens"), s"$lang: $a vs $b")
        case _ =>
      }
      s.foreach { r =>
        val bound = r.getAs[Long]("u_tokens").toDouble * 16.0
        assert(r.getAs[Double]("eff_tokens") < bound,
          s"U*(1+R*) is the asymptote: $r")
      }
    }
  }

  test("the efficiency curve is language-independent") {
    val byEpoch = rows.groupBy(_.getAs[Long]("epochs"))
    byEpoch.foreach { case (e, rs) =>
      val effs = rs.map(_.getAs[Double]("efficiency")).distinct
      assert(effs.size == 1,
        s"epoch-level decay cannot depend on corpus size: E=$e $effs")
    }
  }
}
