package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LmQueries

/** q371's scoring contract: the four backoff branches partition every
  * held-out trigram, only the held-out half is scored, and the NLL is
  * a genuine negative log of sub-unit scores. */
class BackoffSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows =
    LmQueries.q371StupidBackoff(spark, sfDir).collect()

  test("the backoff branches partition every trigram") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Long]("tri_hits") + r.getAs[Long]("bi_backoffs") +
        r.getAs[Long]("uni_backoffs") + r.getAs[Long]("oov_floor")
      assert(total == r.getAs[Int]("n_trigrams").toLong, r.toString)
    }
  }

  test("only the held-out (odd doc_id) half is scored") {
    rows.foreach(r => assert(r.getAs[Long]("doc_id") % 2 == 1, r.toString))
  }

  test("held-out scoring exercises backoff, and NLL is non-negative") {
    val backoffs = rows.map(r => r.getAs[Long]("bi_backoffs") +
      r.getAs[Long]("uni_backoffs") + r.getAs[Long]("oov_floor")).sum
    assert(backoffs > 0,
      "a held-out half with zero backoffs means the split leaked")
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_nll") >= 0.0, r.toString)
    }
  }
}
