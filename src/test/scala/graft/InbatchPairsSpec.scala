package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EmbedStatsQueries

/** q416's layout contract: label-sorted chunking always preserves at
  * least as many positive pairs as random assignment, random coverage
  * sits on its 1/B expectation (hash uniformity), and both coverages
  * fall as batches multiply. */
class InbatchPairsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = EmbedStatsQueries.q416InbatchPairs(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("n_batches"))

  test("sorted batching dominates random at every batch count") {
    assert(rows.map(_.getAs[Long]("n_batches")).toSeq == Seq(4L, 16L, 64L))
    rows.foreach { r =>
      assert(r.getAs[Long]("srt_pairs") >= r.getAs[Long]("rnd_pairs"),
        s"grouping by label cannot lose pairs vs shuffling: $r")
      assert(r.getAs[Double]("advantage") >= 0.0, r.toString)
      assert(r.getAs[Long]("rnd_pairs") <= r.getAs[Long]("pos_pairs"))
      assert(r.getAs[Long]("srt_pairs") <= r.getAs[Long]("pos_pairs"))
    }
  }

  test("random coverage tracks 1/B; both coverages fall with more batches") {
    rows.foreach { r =>
      val gap = math.abs(r.getAs[Double]("random_cobatch") -
        r.getAs[Double]("random_theory"))
      assert(gap < 0.05, s"random assignment must sit near 1/B: $r")
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("random_cobatch") >
          b.getAs[Double]("random_cobatch"), s"$a vs $b")
        assert(a.getAs[Double]("sorted_cobatch") >
          b.getAs[Double]("sorted_cobatch"), s"$a vs $b")
      case _ =>
    }
  }
}
