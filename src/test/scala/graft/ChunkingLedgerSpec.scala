package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SplitQueries

/** q407's chunking contract: the stride = window row has ZERO overlap
  * duplication and exactly ⌈n/W⌉ windows per document; duplicated mass
  * is strictly monotone in the overlap; and the emitted-token identity
  * windows·W = real + duplicated + pad holds on every row. */
class ChunkingLedgerSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = SplitQueries.q407ChunkingLedger(spark, sfDir)
    .collect().sortBy(-_.getAs[Long]("stride"))

  test("non-overlapping stride duplicates nothing and matches ceil(n/W)") {
    val s32 = rows.head
    assert(s32.getAs[Long]("stride") == 32L)
    assert(s32.getAs[Long]("dup_tokens") == 0L, s32.toString)
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(graft.functions.TextFunctions.tokenCount(col("text"))
        .cast("long").as("n"))
      .filter(col("n") > 0)
      .agg(sum(expr("(n + 31) div 32"))).head().getLong(0)
    assert(s32.getAs[Long]("n_chunks") == expected,
      s"stride=W chunking IS ceil(n/W): got ${s32.getAs[Long]("n_chunks")}, want $expected")
  }

  test("duplicated mass grows as the stride shrinks; blowup >= 1") {
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("dup_tokens") < b.getAs[Long]("dup_tokens"),
          s"smaller stride must duplicate strictly more: $a vs $b")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("compute_blowup") >= 1.0, r.toString)
    }
  }

  test("emitted-token identity: windows*W = real + duplicated + pad") {
    rows.foreach { r =>
      val emitted = r.getAs[Long]("n_chunks") * r.getAs[Long]("window")
      val acc = r.getAs[Long]("total_tokens") +
        r.getAs[Long]("dup_tokens") + r.getAs[Long]("pad_tokens")
      assert(emitted == acc, s"mass leak: emitted=$emitted acc=$acc in $r")
    }
  }
}
