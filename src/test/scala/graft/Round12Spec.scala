package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CurationPipeline

/** Round-12 composition checks: the q154 curation-pipeline ledger's
  * structural invariants (the oracle hash pins the exact counts; these
  * assert the SHAPE any correct curation ledger must have). */
class Round12Spec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val ledger =
    CurationPipeline.q154CurationPipeline(spark, sfDir).collect()

  test("ledger covers all seven stages in order with consistent boundaries") {
    assert(ledger.map(_.getAs[Int]("stage_no")).toSeq == (0 to 6))
    assert(ledger.map(_.getAs[String]("stage")).toSeq == Seq("ingest",
      "lang_id", "quality", "exact_dedup", "near_dedup", "decontam", "quota"))
    // each stage's rows_in is the previous stage's rows_out
    ledger.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("rows_in") == a.getAs[Long]("rows_out"))
      case _ => ()
    }
  }

  test("ingest adds duplicates; every later stage only removes rows") {
    val ing = ledger.head
    assert(ing.getAs[Long]("rows_out") > ing.getAs[Long]("rows_in"))
    ledger.tail.foreach { r =>
      assert(r.getAs[Long]("rows_out") <= r.getAs[Long]("rows_in"),
        s"${r.getAs[String]("stage")} grew the corpus")
    }
    // the filters actually filter: dedup stages and gates drop SOMETHING
    // on the injected fixture, and the pipeline ends non-empty
    ledger.tail.foreach { r =>
      assert(r.getAs[Long]("rows_out") < r.getAs[Long]("rows_in"),
        s"${r.getAs[String]("stage")} was a no-op on the injected fixture")
    }
    assert(ledger.last.getAs[Long]("rows_out") > 0)
  }
}
