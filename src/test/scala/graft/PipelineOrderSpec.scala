package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DecontamQueries

/** q430's non-commutativity contract: decontam-first dominates
  * dedup-first by EXACTLY the rescued groups (the identity that defines
  * the rescue), every group is accounted for (survivors + fully-dirty
  * = all groups), and dirty docs never exceed the corpus. */
class PipelineOrderSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val r = DecontamQueries.q430PipelineOrder(spark, sfDir)
    .head()

  test("decontam-first dominates by exactly the rescued groups") {
    val a = r.getAs[Long]("kept_dedup_first")
    val b = r.getAs[Long]("kept_decontam_first")
    assert(b >= a, s"dropping before electing can only keep more: $r")
    assert(b - a == r.getAs[Long]("groups_rescued"),
      s"the dominance gap IS the rescue count: $r")
  }

  test("group accounting closes") {
    assert(r.getAs[Long]("kept_decontam_first") +
      r.getAs[Long]("groups_fully_dirty") == r.getAs[Long]("n_groups"),
      s"a group either has a clean member or is fully dirty: $r")
    assert(r.getAs[Long]("n_dirty_docs") <= r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("n_groups") <= r.getAs[Long]("n_docs"))
    val share = r.getAs[Double]("rescued_share")
    assert(share >= 0.0 && share < 1.0, r.toString)
  }
}
