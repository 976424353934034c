package graft

import java.lang.Double.doubleToRawLongBits

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WeightedSample
import graft.queries.{LmQueries, StatsQueries}

/** Pins the negative-zero determinism convention (round 9, VERDICT r8 #1):
  * a double in (-0.5·10⁻ⁿ, 0) rounds to ZERO at n dp, and the two engines
  * disagree on its sign — Spark's BigDecimal-backed `round` emits +0.0
  * (bits 0x0000…) while DuckDB's ROUND keeps the IEEE sign bit (-0.0,
  * bits 0x8000…). Value-equal but byte-hash-distinct, which is exactly
  * what the correctness gate hashes. The convention: every rounded double
  * OUTPUT column that can reach zero from below gets `+ 0.0` appended on
  * BOTH engines (IEEE: -0.0 + 0.0 = +0.0), collapsing the sign split.
  *
  * Applied sites: WeightedSample.aesScore/aesScoreSql (q79 — the round-8
  * failure), q59/q83 avg_nll (the `-avg(lp)` negation corner), q84 lo/hi
  * bin edges (negative-domain generality), and q60 d2 / q64 sq_err
  * (squared distances spelled (n2 + cn2) - 2·dot are non-negative only in
  * REAL arithmetic — cancellation can land a tiny negative double when a
  * vector numerically coincides with its rounded centroid). q29's entropy
  * needs none: it routes the rounded double through DECIMAL(18,12), and
  * decimals have no signed zero.
  */
class NegZeroSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  private def bitsOf(df: org.apache.spark.sql.DataFrame): Long =
    doubleToRawLongBits(df.head().getDouble(0))

  private val posZeroBits = 0L
  private val negZeroBits = doubleToRawLongBits(-0.0)

  test("the hazard is real: Spark negation makes -0.0; + 0.0 collapses it") {
    val df = Seq(0.0).toDF("v")
    // -avg(+0.0) is IEEE -0.0 before any rounding
    assert(bitsOf(df.agg((-avg($"v")).as("x"))) === negZeroBits,
      "expected Spark to produce a raw -0.0 from negating +0.0")
    // the convention restores +0.0
    assert(bitsOf(df.agg((-avg($"v") + lit(0.0)).as("x"))) === posZeroBits)
  }

  test("Spark round() of a tiny negative emits +0.0 (engine fact the " +
    "DuckDB side diverges from — hence + 0.0 on BOTH sides)") {
    val df = Seq(-1e-24).toDF("v")
    assert(bitsOf(df.select(round($"v", 9).as("x"))) === posZeroBits)
    assert(bitsOf(df.select((round($"v", 9) + lit(0.0)).as("x")))
      === posZeroBits)
  }

  test("aesScore with an extreme weight rounds to exactly +0.0 bits") {
    // ln(u)/w with w = 1e30 is ~ -1e-30: rounds to zero at 9 dp. The
    // q79 failure mode was this row hashing as -0.0 on the oracle side.
    val df = Seq(("12673", 1e30)).toDF("k", "w")
    val score = df.select(
      WeightedSample.aesScore(col("k"), col("w")).as("s"))
    assert(bitsOf(score) === posZeroBits,
      "aesScore must normalize a round-to-zero score to +0.0")
  }

  test("q59/q83 avg_nll and q84 bin edges carry the + 0.0 normalization " +
    "in both the Spark plan and the DuckDB twin") {
    // plan-level pin: the normalization survives into the optimized plan
    // (constant-folding must NOT strip `+ 0.0` — Catalyst keeps it
    // because it is not an identity on -0.0)
    val nll = LmQueries.q59UnigramNll(spark, sfDir)
    assert(nll.queryExecution.optimizedPlan.toString.contains("+ 0.0"),
      "q59 lost its + 0.0 normalization in the optimized plan")
    val bnll = LmQueries.q83BigramNll(spark, sfDir)
    assert(bnll.queryExecution.optimizedPlan.toString.contains("+ 0.0"),
      "q83 lost its + 0.0 normalization in the optimized plan")
    val hist = StatsQueries.q84EquiwidthHist(spark, sfDir)
    assert(hist.queryExecution.optimizedPlan.toString.contains("+ 0.0"),
      "q84 lost its + 0.0 normalization in the optimized plan")
    // oracle twins spell the identical normalization
    assert(LmQueries.q59Sql.contains("round(-avg(lp), 6) + 0.0"))
    assert(LmQueries.q83Sql.contains("round(-avg(lp), 6) + 0.0"))
    assert(StatsQueries.q84Sql.contains("+ 0.0 AS lo"))
    assert(StatsQueries.q84Sql.contains("+ 0.0 AS hi"))
    assert(WeightedSample.aesScoreSql("k", "w").contains("+ 0.0"))
    // squared distances (cancellation corner): q60 d2, q64 sq_err
    assert(graft.operators.KMeans.q60Sql.contains("round(d2, 6) + 0.0"))
    assert(graft.operators.KMeans.q64Sql.contains("+ 0.0 AS sq_err"))
  }
}
