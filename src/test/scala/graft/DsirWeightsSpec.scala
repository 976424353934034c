package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LmQueries

/** q406's selection contract: the target lang ('en') scores the highest
  * mean importance weight AND the highest selected share — the method
  * pulling toward its own target is DSIR working; shares stay in [0,1]
  * and selected masses never exceed their lang totals. */
class DsirWeightsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = LmQueries.q406DsirWeights(spark, sfDir).collect()

  test("the target lang is argmax of mean weight and of selected share") {
    val best = rows.maxBy(_.getAs[Double]("mean_w"))
    assert(best.getAs[String]("lang") == "en",
      s"target lang must score highest mean_w: ${rows.mkString("; ")}")
    val bestShare = rows.maxBy(_.getAs[Double]("selected_share"))
    assert(bestShare.getAs[String]("lang") == "en",
      s"target lang must have the top selected share: ${rows.mkString("; ")}")
  }

  test("selection accounting: shares in [0,1], selected mass bounded") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("selected_share")
      assert(s >= 0.0 && s <= 1.0, r.toString)
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_docs"), r.toString)
      assert(r.getAs[Long]("selected_tokens") <= r.getAs[Long]("tokens"),
        r.toString)
    }
  }
}
