package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EstimateQueries

/** q414's federation contract: the safety implication is sound (when
  * the largest union-excluded global count is below the k-th true
  * count, the protocol provably lost nothing — so recall must be 1.0),
  * its contrapositive holds on every lossy row, and the union/overlap
  * accounting is bounded by the protocol's structure. */
class TopkFederationSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = EstimateQueries.q414TopkFederation(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("n_shards"))

  test("safety implication: provably_safe rows have perfect recall") {
    assert(rows.map(_.getAs[Long]("n_shards")).toSeq == Seq(2L, 4L, 8L))
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      if (r.getAs[Boolean]("provably_safe"))
        assert(r.getAs[Long]("overlap") == k,
          s"an excluded max below the k-th true count cannot lose: $r")
      if (r.getAs[Long]("overlap") < k)
        assert(!r.getAs[Boolean]("provably_safe"),
          s"a miss requires an excluded count at or above the k-th: $r")
    }
  }

  test("protocol accounting: union and overlap bounds") {
    rows.foreach { r =>
      val k = r.getAs[Long]("k"); val s = r.getAs[Long]("n_shards")
      val u = r.getAs[Long]("union_size")
      assert(u >= k && u <= s * k,
        s"the union holds between one and S local top-k lists: $r")
      assert(r.getAs[Long]("overlap") <= k, r.toString)
      val rec = r.getAs[Double]("recall_at_k")
      assert(math.abs(rec - r.getAs[Long]("overlap").toDouble / k) < 1e-9)
      assert(r.getAs[Long]("kth_true_cnt") > 0L)
    }
  }
}
