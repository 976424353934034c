package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EstimateQueries

/** q356's algebra contract on a CONSTRUCTED two-source corpus (the
  * oracle hash certifies arithmetic parity; this spec certifies the
  * merge law): per-source registers max-merged agree with the direct
  * union build bucket-for-bucket, overlapping vocabulary is not
  * double-counted by the union sketch, and per-source exact counts
  * stay per-source. */
class HllMergeSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val rows = {
    val dir = Files.createTempDirectory("graft-hllmerge")
    // source A: t1..t40; source B: t21..t60 — overlap t21..t40,
    // union is exactly 60 terms
    Seq(
      (1L, (1 to 40).map(i => s"t$i").mkString(" "), "a"),
      (2L, (21 to 60).map(i => s"t$i").mkString(" "), "b"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    EstimateQueries.q356HllMergeCert(spark, dir.toString).collect()
      .map(r => r.getAs[String]("scope") -> r).toMap
  }

  test("per-source and union rows carry the right exact counts") {
    assert(rows.keySet == Set("a", "b", "union"))
    assert(rows("a").getAs[Long]("n_exact") == 40L)
    assert(rows("b").getAs[Long]("n_exact") == 40L)
    assert(rows("union").getAs[Long]("n_exact") == 60L,
      "the 20 shared terms count once in the union")
  }

  test("max-merged registers agree with the direct build on all 64 buckets") {
    assert(rows("union").getAs[Long]("registers_agree") == 64L)
    assert(rows("a").isNullAt(rows("a").fieldIndex("registers_agree")))
  }

  test("the union sketch does not double-count the shared vocabulary") {
    // the honest mergeability property: the union estimate must fall
    // below the SUM of the per-source estimates (which double-counts
    // the 20 shared terms) — not a tight accuracy bar, which a 60-item
    // stream against m = 64 registers cannot promise (σ ≈ 13%)
    val est = rows("union").getAs[Double]("hll_estimate")
    val sumParts = rows("a").getAs[Double]("hll_estimate") +
      rows("b").getAs[Double]("hll_estimate")
    assert(est < sumParts,
      s"union $est should undercut the double-counting sum $sumParts")
    assert(est > rows("a").getAs[Double]("hll_estimate"),
      "and exceed either single source")
  }
}
