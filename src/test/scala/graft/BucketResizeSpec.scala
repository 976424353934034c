package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ShardQueries

/** q415's resize contract: the power-of-two double satisfies the split
  * property on EVERY row (each key stays at b or moves to b + 16), the
  * movement bill shrinks as the target gets friendlier to 16
  * (17 ≫ 24 > 32), and the measured shares sit on the number-theory
  * line (hash uniformity). */
class BucketResizeSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = ShardQueries.q415BucketResize(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("target_buckets"))

  test("doubling to 32 is graceful: split property holds exactly") {
    val t32 = rows.find(_.getAs[Long]("target_buckets") == 32L).get
    assert(t32.getAs[Double]("split_property_share") == 1.0,
      s"every key must stay or move to b+16 under a doubling: $t32")
  }

  test("movement bill: 17 is worst, 32 is best; theory gap is small") {
    val shares = rows.map(_.getAs[Double]("moved_share"))
    assert(shares(0) > shares(1) && shares(1) > shares(2),
      s"moved share must fall toward the doubling: ${shares.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Double]("uniformity_gap") < 0.03,
        s"measured share must sit on the uniform-hash theory: $r")
    }
  }
}
