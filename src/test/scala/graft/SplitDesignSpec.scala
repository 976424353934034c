package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SplitQueries

/** q419's taxonomy contract: the time cutoff has ZERO causal leakage
  * by construction, user-grouped splitting has ZERO straddling users
  * (and hence zero causal leaks), event-random leaks causally on any
  * active user base, and every policy partitions the same event log. */
class SplitDesignSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val byPolicy = SplitQueries.q419SplitDesign(spark, sfDir)
    .collect().map(r => r.getAs[String]("policy") -> r).toMap

  test("each policy fails exactly its own way") {
    val tc = byPolicy("time_cutoff")
    assert(tc.getAs[Long]("causal_leaks") == 0L,
      s"nothing before the cutoff can follow a train event: $tc")
    val ug = byPolicy("user_grouped")
    assert(ug.getAs[Long]("straddling_users") == 0L,
      s"a user hashes to exactly one side: $ug")
    assert(ug.getAs[Long]("causal_leaks") == 0L,
      s"no straddling means no same-user time inversion: $ug")
    val er = byPolicy("event_random")
    assert(er.getAs[Long]("causal_leaks") > 0L,
      s"independent event hashing must interleave a user's timeline: $er")
    assert(er.getAs[Long]("straddling_users") > 0L, er.toString)
  }

  test("every policy partitions the same log and user base") {
    val totals = byPolicy.values
      .map(r => r.getAs[Long]("n_train") + r.getAs[Long]("n_test")).toSet
    assert(totals.size == 1, s"same event log under every policy: $totals")
    val users = byPolicy.values.map(_.getAs[Long]("n_users")).toSet
    assert(users.size == 1, s"same user base: $users")
    byPolicy.values.foreach { r =>
      assert(r.getAs[Long]("causal_leaks") <= r.getAs[Long]("n_test"))
    }
  }
}
