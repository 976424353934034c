package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ScrubQueries

/** q405's clipping contract: kept mass is monotone non-decreasing and
  * clipped cells monotone non-increasing in the bound; a bound at or
  * above the max contribution clips nothing and keeps everything; and
  * the C=1 row degenerates to exactly one kept event per user-day. */
class ContributionClippingSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = ScrubQueries
    .q405ContributionClipping(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("clip_bound"))

  test("five bounds; kept mass monotone up, clipped cells monotone down") {
    assert(rows.map(_.getAs[Long]("clip_bound")).toSeq ==
      Seq(1L, 2L, 4L, 8L, 16L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("kept_events") <= b.getAs[Long]("kept_events"),
          s"a larger bound can only keep more: $a vs $b")
        assert(a.getAs[Long]("clipped_user_days") >=
          b.getAs[Long]("clipped_user_days"),
          s"a larger bound can only clip fewer cells: $a vs $b")
      case _ =>
    }
  }

  test("C=1 keeps exactly one event per user-day; no bound keeps more than total") {
    val c1 = rows.head
    assert(c1.getAs[Long]("kept_events") == c1.getAs[Long]("n_user_days"),
      s"min(c,1) summed over cells IS the cell count: $c1")
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_events") <= r.getAs[Long]("total_events"))
      val ks = r.getAs[Double]("kept_share")
      assert(ks > 0.0 && ks <= 1.0, r.toString)
    }
  }

  test("a bound at or above max_contrib is a no-op") {
    val maxC = rows.head.getAs[Long]("max_contrib")
    rows.filter(_.getAs[Long]("clip_bound") >= maxC).foreach { r =>
      assert(r.getAs[Long]("clipped_user_days") == 0L, r.toString)
      assert(r.getAs[Long]("kept_events") == r.getAs[Long]("total_events"),
        r.toString)
    }
  }
}
