package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.LmQueries

/** q362's masking contract (the oracle hash certifies the md5
  * arithmetic; this spec certifies the plan's invariants): one span per
  * 20-token block, lengths clipped at block ends, the ~15% rate, and
  * full determinism across runs. */
class SpanCorruptionSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("graft-spancorr")
    Seq(
      (1L, (1 to 45).map(i => s"t$i").mkString(" "), "en"),  // 3 blocks
      (2L, (1 to 40).map(i => s"u$i").mkString(" "), "en"),  // exact blocks
      (3L, (1 to 2).map(i => s"v$i").mkString(" "), "en"))   // tiny doc
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$d/documents.parquet")
    d.toString
  }

  private lazy val rows = LmQueries.q362SpanCorruption(spark, dir)
    .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("one span per 20-token block, clipped at block ends") {
    val r = rows(1L)
    assert(r.getAs[Long]("n_spans") == 3L, "45 tokens -> 3 blocks")
    val masked = r.getAs[Long]("n_masked")
    assert(masked >= 7L && masked <= 9L,
      "two full 3-token spans + a 1..3-token span in the 5-token tail")
    assert(r.getAs[Double]("corruption_rate") ==
      BigDecimal(masked / 45.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("exact-multiple docs mask exactly 15% unless a span hits a block end") {
    val r = rows(2L)
    assert(r.getAs[Long]("n_spans") == 2L)
    assert(r.getAs[Long]("n_masked") <= 6L &&
      r.getAs[Long]("n_masked") >= 2L)
  }

  test("a sub-block doc still receives one clipped span") {
    val r = rows(3L)
    assert(r.getAs[Long]("n_spans") == 1L)
    assert(r.getAs[Long]("n_masked") <= 2L)
  }

  test("the plan is fully deterministic across runs") {
    val a = LmQueries.q362SpanCorruption(spark, dir).collect().toSeq
    val b = LmQueries.q362SpanCorruption(spark, dir).collect().toSeq
    assert(a == b)
  }
}
