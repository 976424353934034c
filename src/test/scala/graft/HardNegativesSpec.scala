package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EmbedQueries

/** q384's mining contract: every probe accounts for the whole corpus,
  * the violation flag is exactly margin < 0, and positives/negatives
  * are genuine cosines (bounded by 1 in magnitude up to rounding). */
class HardNegativesSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows =
    EmbedQueries.q384HardNegatives(spark, sfDir).collect()

  test("probes exist and account for the whole corpus") {
    assert(rows.nonEmpty, "md5 probe rule must sample someone")
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_same") + r.getAs[Long]("n_diff") == n - 1,
        s"every non-probe vector is same or diff: $r")
    }
  }

  test("violation flag is exactly margin < 0; sims bounded") {
    rows.foreach { r =>
      val pos = r.getAs[Double]("pos_sim")
      val neg = r.getAs[Double]("hard_neg_sim")
      assert(math.abs(pos) <= 1.0 + 1e-6 && math.abs(neg) <= 1.0 + 1e-6)
      assert(math.abs(r.getAs[Double]("margin") - (pos - neg)) <= 2e-6)
      assert(r.getAs[Boolean]("violation") == (neg > pos) ||
        math.abs(neg - pos) < 2e-6, r.toString)
    }
  }
}
