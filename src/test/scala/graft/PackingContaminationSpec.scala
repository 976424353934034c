package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SplitQueries

/** q422's tradeoff contract: longer contexts split fewer documents but
  * co-locate more (contamination pairs strictly rise, split share
  * strictly falls), the co-residency identity Σm = n_docs + split-seq
  * crossings holds, and every boundary-adjacent bound is respected
  * (split docs < n_seqs — a doc crossing k boundaries consumes them). */
class PackingContaminationSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = SplitQueries
    .q422PackingContamination(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("max_len"))

  test("the tradeoff direction: longer contexts split less, mix more") {
    assert(rows.map(_.getAs[Long]("max_len")).toSeq ==
      Seq(128L, 512L, 2048L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("split_share") >
          b.getAs[Double]("split_share"),
          s"longer sequences cross fewer doc boundaries: $a vs $b")
        assert(a.getAs[Long]("cross_pairs") <
          b.getAs[Long]("cross_pairs"),
          s"longer sequences co-locate more documents: $a vs $b")
        assert(a.getAs[Double]("avg_docs_per_seq") <
          b.getAs[Double]("avg_docs_per_seq"), s"$a vs $b")
      case _ =>
    }
  }

  test("packing accounting: corpus constant, splits bounded by boundaries") {
    val toks = rows.map(_.getAs[Long]("total_tokens")).distinct
    assert(toks.size == 1, s"corpus mass is L-independent: $toks")
    rows.foreach { r =>
      assert(r.getAs[Long]("split_docs") < r.getAs[Long]("n_seqs"),
        s"each split doc consumes at least one of the n_seqs-1 " +
          s"boundaries: $r")
      assert(r.getAs[Long]("cross_pairs") >= 0L)
      assert(r.getAs[Double]("avg_docs_per_seq") >= 1.0, r.toString)
    }
  }
}
