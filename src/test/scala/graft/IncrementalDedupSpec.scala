package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions.fingerprint
import graft.operators.IncrementalDedup

/** Incremental batch dedup against the persisted bucketed fingerprint
  * store (round 9 — VERDICT r8 #2). */
class IncrementalDedupSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  private def fpOf(texts: Seq[(Long, String, String)]) =
    texts.toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"), fingerprint(col("text")).as("fp"))

  test("two batches: batch 2 drops batch 1's docs through the store") {
    val base = Files.createTempDirectory("graft-incdedup")
    val table = "inc_dedup_store_t1"
    try {
      val batch1 = fpOf(Seq(
        (1L, "en", "alpha beta gamma"),
        (2L, "en", "delta epsilon"),
        (3L, "de", "zeta eta theta")))
      IncrementalDedup.writeStore(batch1, table, base.resolve("s").toString)

      val batch2 = fpOf(Seq(
        (10L, "en", "alpha  beta   gamma"), // dup of doc 1 after normalization
        (11L, "en", "delta epsilon"),       // verbatim dup of doc 2
        (12L, "fr", "iota kappa"),          // novel
        (13L, "fr", "iota kappa"),          // in-batch dup of 12 — must lose
        (14L, "en", "lambda mu")))          // novel
      val surv = IncrementalDedup
        .dedupAgainstStore(batch2, spark.table(table))
        .collect().map(r => r.getAs[Long]("doc_id")).sorted
      assert(surv.toSeq == Seq(12L, 14L),
        s"batch-1 dupes and the in-batch larger id must drop, got ${surv.toSeq}")

      // admit batch 2's survivors, then a batch 3 re-sending them must drop
      IncrementalDedup.appendToStore(
        fpOf(Seq((12L, "fr", "iota kappa"), (14L, "en", "lambda mu"))),
        table, base.resolve("s").toString)
      val batch3 = fpOf(Seq(
        (20L, "fr", "iota kappa"),   // admitted in batch 2 — drop
        (21L, "en", "nu xi omicron"))) // novel
      val surv3 = IncrementalDedup
        .dedupAgainstStore(batch3, spark.table(table))
        .collect().map(r => r.getAs[Long]("doc_id")).toSeq
      assert(surv3 == Seq(21L),
        s"append must make batch-2 survivors drop in batch 3, got $surv3")
    } finally {
      spark.sql("DROP TABLE IF EXISTS inc_dedup_store_t1")
    }
  }

  test("store side of the anti-join is shuffle-free off the bucketed scan") {
    val base = Files.createTempDirectory("graft-incdedup-plan")
    val table = "inc_dedup_store_t2"
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val store = fpOf((1L to 200L).map(i => (i, "en", s"stored text $i")))
      IncrementalDedup.writeStore(store, table, base.resolve("s").toString)
      // forbid broadcast: the property under test is that the bucketed
      // scan satisfies the anti-join's store-side distribution
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = fpOf((150L to 250L).map(i => (i + 1000L, "en", s"stored text $i")))
      val out = IncrementalDedup.dedupAgainstStore(batch, spark.table(table))
      assert(out.count() == 50) // 201..250 are novel
      val plan = out.queryExecution.executedPlan.toString
      // exactly ONE exchange: the incoming batch hashes to the store's
      // bucketing; the store scan itself satisfies the join distribution,
      // and the min-struct agg reuses the join's partitioning
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"expected exactly one Exchange (batch side), got $exchanges in:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS inc_dedup_store_t2")
    }
  }

  test("registered q94 drops re-crawled docs, keeps fresh min-id copies") {
    val rows = IncrementalDedup.q94IncrementalDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every survivor is a +2e12 'fresh v1' id: re-crawl clones (+1e12)
    // all drop against the store; +3e12 copies lose the in-batch tiebreak
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id >= 2000000000000L && id < 3000000000000L,
        s"unexpected survivor id $id")
    }
    // deterministic across invocations (store overwrite each run)
    val again = IncrementalDedup.q94IncrementalDedup(spark, sfDir).collect()
    assert(rows.sameElements(again))
  }
}
