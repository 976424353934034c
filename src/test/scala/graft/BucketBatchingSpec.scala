package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SplitQueries

/** q410's batching contract: padding is monotone non-increasing in the
  * bucket count (a finer equal-count partition of a sorted order can
  * only lower each element's bucket max), the B = 1 row is the
  * global-max baseline with saving 0, and the device-token identity
  * holds on every row. */
class BucketBatchingSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = SplitQueries.q410BucketBatching(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("n_buckets"))

  test("padding monotone down, saving monotone up as buckets increase") {
    assert(rows.map(_.getAs[Long]("n_buckets")).toSeq ==
      Seq(1L, 2L, 4L, 8L, 16L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("pad_tokens") >= b.getAs[Long]("pad_tokens"),
          s"more buckets cannot pad more: $a vs $b")
        assert(a.getAs[Double]("saving_vs_global") <=
          b.getAs[Double]("saving_vs_global"), s"$a vs $b")
      case _ =>
    }
    assert(rows.head.getAs[Double]("saving_vs_global") == 0.0,
      "B=1 is its own baseline")
  }

  test("token accounting: constant corpus, device = real + pad") {
    val toks = rows.map(_.getAs[Long]("total_tokens")).distinct
    assert(toks.size == 1, s"corpus mass must not depend on B: $toks")
    rows.foreach { r =>
      assert(r.getAs[Long]("device_tokens") ==
        r.getAs[Long]("total_tokens") + r.getAs[Long]("pad_tokens"), r.toString)
      val ps = r.getAs[Double]("pad_share")
      assert(ps >= 0.0 && ps < 1.0, r.toString)
    }
  }
}
