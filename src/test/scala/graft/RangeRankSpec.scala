package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeRank

/** RangeRank must be BIT-IDENTICAL to the single-partition window
  * formulations it replaces — on duplicate-heavy data, under descending
  * keys, and at every awkward total-vs-bucket ratio — while actually
  * spreading the work across >1 range partition. */
class RangeRankSpec extends AnyFunSuite {
  import SparkTestSession._

  // deterministic LCG (Round11Spec convention)
  private def lcg(n: Int, mod: Int): Seq[Int] = {
    var seed = 0x9E3779B97F4A7C15L
    (1 to n).map { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % mod).toInt + mod) % mod
    }
  }

  // duplicate-heavy scored entities: many ties on score, unique id tiebreak
  private lazy val scored = {
    import spark.implicits._
    lcg(997, 50).zipWithIndex
      .map { case (s, i) => (i.toLong, s, (s % 7) * 100L + i) }
      .toDF("id", "score", "spend")
  }

  test("withGlobalRank equals the single-partition row_number") {
    val keys = Seq(col("score"), col("id"))
    val got = RangeRank.withGlobalRank(scored, "rk", keys)
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = scored
      .withColumn("rk", row_number().over(Window.orderBy(keys: _*)).cast("long"))
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("withGlobalRank spreads rows over more than one range partition") {
    val keys = Seq(col("score"), col("id"))
    val parts = RangeRank.withGlobalRank(scored, "rk", keys)
      .select(spark_partition_id()).distinct().count()
    assert(parts > 1, s"expected multi-partition execution, got $parts")
  }

  test("withRunningMax (inclusive + exclusive) equals the single-partition window") {
    val keys = Seq(col("score"), col("id"))
    val wIncl = Window.orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExcl = Window.orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val gotI = RangeRank.withRunningMax(scored, col("spend"), "rm", keys)
      .select("id", "rm").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantI = scored.withColumn("rm", max(col("spend")).over(wIncl))
      .select("id", "rm").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotI == wantI)
    val gotE = RangeRank
      .withRunningMax(scored, col("spend"), "rm", keys, inclusive = false)
      .select("id", "rm").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val wantE = scored.withColumn("rm", max(col("spend")).over(wExcl))
      .select("id", "rm").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(gotE == wantE)
    assert(gotE.values.exists(_.isEmpty), "exclusive form must yield a NULL first row")
  }

  test("withRunningSum equals the single-partition cumulative window, desc keys") {
    val keys = Seq(col("spend").desc, col("id"))
    val got = RangeRank.withRunningSum(scored, col("spend"), "cum", keys)
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = scored.withColumn("cum", sum(col("spend")).over(w))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("withNtile matches SQL NTILE at awkward total/bucket ratios") {
    import spark.implicits._
    val keys = Seq(col("score"), col("id"))
    // 997 rows vs buckets that don't divide it; plus n > total
    for (n <- Seq(1, 2, 5, 7, 10, 996, 997, 1200)) {
      val got = RangeRank.withNtile(scored, "b", n, keys)
        .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = scored
        .withColumn("b", ntile(n).over(Window.orderBy(keys: _*)))
        .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == want, s"ntile($n) diverged")
    }
    // tiny frame: fewer rows than partitions
    val tiny = Seq((1L, 9), (2L, 3), (3L, 3)).toDF("id", "score")
    val got = RangeRank.withNtile(tiny, "b", 2, Seq(col("score"), col("id")))
      .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(2L -> 1, 3L -> 1, 1L -> 2))
  }
}
