package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EntityQueries

/** q409's blocking contract: symspell is recall-complete (1.0) at the
  * lowest pairs-per-match; stride blocking retains EXACTLY the
  * same-length matches (q81's recall-completeness argument, here as an
  * identity against length-only blocking); and length-only blocking on
  * fixed-width names pays a quadratic candidate bill for no recall
  * gain over the stride blocks. */
class BlockingPlanSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val byStrategy = EntityQueries.q409BlockingPlan(spark, sfDir)
    .collect().map(r => r.getAs[String]("strategy") -> r).toMap

  test("symspell: recall 1.0; no strategy finds more matches") {
    val ss = byStrategy("symspell")
    assert(ss.getAs[Double]("recall") == 1.0, ss.toString)
    byStrategy.values.foreach { r =>
      assert(r.getAs[Long]("n_matches") <= ss.getAs[Long]("n_matches"),
        s"nothing can beat the complete relation: $r vs $ss")
      val rec = r.getAs[Double]("recall")
      assert(rec > 0.0 && rec <= 1.0, r.toString)
      assert(r.getAs[Long]("n_matches") <= r.getAs[Long]("n_candidates"),
        s"matches are verified candidates: $r")
    }
  }

  test("stride blocking retains exactly the same-length matches") {
    assert(byStrategy("len_stride").getAs[Long]("n_matches") ==
      byStrategy("len_only").getAs[Long]("n_matches"),
      "q81's half-stride blocks are recall-complete for same-length " +
        "substitutions, so their match count must equal length-only's")
  }

  test("length-only blocking is the quadratic bill (fixed-width names)") {
    val lo = byStrategy("len_only"); val ls = byStrategy("len_stride")
    assert(lo.getAs[Long]("n_candidates") > 3L * ls.getAs[Long]("n_candidates"),
      s"len_only must cost several times the stride candidates for the " +
        s"same matches: $lo vs $ls")
    assert(lo.getAs[Double]("pairs_per_match") >
      ls.getAs[Double]("pairs_per_match"), s"$lo vs $ls")
  }
}
