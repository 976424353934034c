package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LmQueries

/** q412's quantization contract: the measured NLL drift honors the
  * mathematical bound |drift| ≤ step/2 at every bit width (each
  * token's log-prob moves at most half a grid step, so the weighted
  * mean does too), the grid step shrinks 4× per 2 bits, and the exact
  * NLL is the same baseline on every row. */
class LmQuantizationSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = LmQueries.q412LmQuantization(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("bits"))

  test("drift bounded by half a grid step at every width") {
    assert(rows.map(_.getAs[Long]("bits")).toSeq == Seq(4L, 6L, 8L))
    rows.foreach { r =>
      val drift = math.abs(r.getAs[Double]("nll_drift"))
      val bound = r.getAs[Double]("step") / 2.0
      assert(drift <= bound + 1e-9,
        s"quantization moved the corpus NLL beyond the grid bound: $r")
    }
  }

  test("step shrinks 4x per 2 bits; baseline constant; bytes grow") {
    val steps = rows.map(_.getAs[Double]("step"))
    assert(steps(0) / steps(1) > 3.9 && steps(0) / steps(1) < 4.4,
      s"15->63 levels is ~4.2x finer: $steps")
    assert(steps(1) / steps(2) > 3.9 && steps(1) / steps(2) < 4.2,
      s"63->255 levels is ~4.05x finer: $steps")
    assert(rows.map(_.getAs[Double]("nll_exact")).distinct.size == 1)
    val bytes = rows.map(_.getAs[Long]("codebook_bytes")).toSeq
    assert(bytes == bytes.sorted && bytes.distinct == bytes,
      s"codebook must grow strictly with bits: $bytes")
  }
}
