package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EvalQueries

/** q428's matching contract: exactly ⌊n/2⌋ pairs per language (each doc
  * used at most once, the middle doc of an odd group unpaired), gaps
  * are non-negative by construction (the i-th best always beats the
  * i-th worst), and the floor counts are monotone in the floor. */
class PreferencePairsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = EvalQueries.q428PreferencePairs(spark, sfDir)
    .collect()

  test("rank matching: floor(n/2) pairs, non-negative mean gap") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == r.getAs[Long]("n_docs") / 2,
        s"one pair per (best_i, worst_i) couple: $r")
      assert(r.getAs[Double]("mean_gap") >= 0.0,
        s"the i-th best cannot score below the i-th worst: $r")
    }
  }

  test("gap floors: counts monotone, bounded by the pair count") {
    rows.foreach { r =>
      val (a, b, c) = (r.getAs[Long]("ge_010"), r.getAs[Long]("ge_020"),
        r.getAs[Long]("ge_040"))
      assert(a >= b && b >= c, s"a higher floor keeps fewer pairs: $r")
      assert(a <= r.getAs[Long]("n_pairs"), r.toString)
    }
  }
}
