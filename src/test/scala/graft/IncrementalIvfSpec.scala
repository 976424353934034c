package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalIvf

/** q153's contract is CROSS-BATCH reachability: batch-2 (appended)
  * probes must retrieve batch-1 (pre-indexed) vectors through the frozen
  * probe → ADC → shortlist → re-rank path, with no index rebuild. The
  * oracle hash certifies arithmetic parity; this spec certifies the
  * maintenance semantics the hash alone can't express. */
class IncrementalIvfSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val rows =
    IncrementalIvf.q153IvfAppend(spark, sfDir).collect()

  test("appended-batch probes return results through the frozen index") {
    assert(rows.nonEmpty)
    // probes are batch-2 members only (vec_id % 5 == 0, below the cap)
    val qids = rows.map(_.getAs[Long]("query_id")).distinct
    assert(qids.nonEmpty && qids.forall(q => q % 5 == 0 && q < 25))
    // per query: ranks are contiguous from 1, neighbors distinct
    qids.foreach { q =>
      val rs = rows.filter(_.getAs[Long]("query_id") == q)
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length))
      val ns = rs.map(_.getAs[Long]("neighbor_id"))
      assert(ns.distinct.length == ns.length)
      assert(!ns.contains(q), "a probe must not retrieve itself")
    }
  }

  test("batch-1 vectors are retrieved by batch-2 probes (the append finds the index)") {
    val batches = rows.groupBy(_.getAs[Int]("from_batch")).view.mapValues(_.length).toMap
    // batch 1 is 80% of the corpus: the top-k lists must reach it
    assert(batches.getOrElse(1, 0) > 0,
      s"no batch-1 neighbors retrieved: $batches")
    // from_batch is consistent with the id split
    rows.foreach { r =>
      val expected = if (r.getAs[Long]("neighbor_id") % 5 == 0) 2 else 1
      assert(r.getAs[Int]("from_batch") == expected)
    }
  }
}
