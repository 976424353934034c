package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BandStore
import graft.streaming.NearDupProbeStream

/** The MinHash-band-store live admission twin (VERDICT r15 #1): verdicts
  * streamed through foreachBatch must agree row-for-row with the
  * registered batch probe (q435's operator) on the same doc log, and
  * must be invariant to how the log splits into micro-batches —
  * statelessness against the frozen store generation is the claim, so
  * two different splits must give the same rows. */
class NearDupProbeStreamSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private val a = (r: Range) => r.map(i => s"a$i").mkString(" ")
  private val c = (r: Range) => r.map(i => s"c$i").mkString(" ")

  // the doc log: a tail-appended near-clone of stored doc 1 (must flag,
  // best_match = 1), a novel doc (clean), a verbatim copy of stored doc 2
  // (jaccard exactly 1.0), and a sub-3-token doc whose single whole-doc
  // shingle matches nothing (clean with zero candidates)
  private val log: Seq[(Long, String)] = Seq(
    101L -> (a(1 to 40) + " zz tail"),
    102L -> (1 to 40).map(i => s"w$i").mkString(" "),
    103L -> c(1 to 40),
    104L -> "two tokens")

  private def key(r: org.apache.spark.sql.Row) =
    r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_matches"),
        r.getAs[Double]("best_jaccard"), r.getAs[Long]("best_match"),
        r.getAs[Int]("is_near_dup")))

  private def streamVerdicts(split: Seq[Seq[(Long, String)]],
      bands: org.apache.spark.sql.DataFrame,
      shingles: org.apache.spark.sql.DataFrame, tag: String) = {
    val out = Files.createTempDirectory(s"graft-ndps-out-$tag").toString
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = NearDupProbeStream.start(
      mem.toDF().toDF("doc_id", "text"), bands, shingles, out)
    try
      split.foreach { epoch =>
        mem.addData(epoch: _*)
        q.processAllAvailable()
      }
    finally q.stop()
    spark.read.parquet(out).collect().map(key).toMap
  }

  test("streamed verdicts equal the batch probe, for any batch split") {
    val base = Files.createTempDirectory("graft-ndps")
    val table = "neardup_probe_stream_t1"
    try {
      BandStore.writeStore(
        docsDf(1L -> a(1 to 40), 2L -> c(1 to 40)),
        table, base.resolve("s").toString)
      val bands = spark.table(BandStore.bandsTable(table))
      val shingles = spark.table(BandStore.shinglesTable(table))
      val batch = BandStore.probeStore(docsDf(log: _*), bands, shingles)
        .collect().map(key).toMap

      // split A: one epoch per document; split B: 2 + 2
      val byOne = streamVerdicts(log.map(Seq(_)), bands, shingles, "one")
      val byTwo = streamVerdicts(log.grouped(2).toSeq, bands, shingles,
        "two")

      assert(batch.keySet == Set(101L, 102L, 103L, 104L))
      assert(byOne == batch, "per-doc epochs must replay the batch probe")
      assert(byTwo == batch, "the split must not change any verdict")
      // spot-pin the semantics so agreement isn't vacuous
      val near = batch(101L)
      assert(near._5 == 1 && near._4 == 1L && near._3 > 0.85,
        s"tail-appended clone must flag against stored doc 1: $near")
      assert(batch(102L) == ((0L, 0L, 0.0, -1L, 0)))
      val exact = batch(103L)
      assert(exact._5 == 1 && exact._4 == 2L && exact._3 == 1.0,
        s"verbatim copy must flag at jaccard 1.0: $exact")
      assert(batch(104L) == ((0L, 0L, 0.0, -1L, 0)))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${BandStore.bandsTable(table)}")
      spark.sql(s"DROP TABLE IF EXISTS ${BandStore.shinglesTable(table)}")
    }
  }

  test("the store side of the probe rides both bucketed scans with no exchange") {
    val base = Files.createTempDirectory("graft-ndps2")
    val table = "neardup_probe_stream_t2"
    try {
      BandStore.writeStore(
        docsDf((1L to 20L).map(i =>
          i -> (i to i + 30).map(j => s"t${j}x$i").mkString(" ")): _*),
        table, base.resolve("s").toString)
      val probe = BandStore.probeStore(docsDf(log: _*),
        spark.table(BandStore.bandsTable(table)),
        spark.table(BandStore.shinglesTable(table)))
      val plan = probe.queryExecution.executedPlan.toString()
      // every Exchange in the plan must sit above the batch side; the two
      // store scans are bucketed and feed their joins directly. Weaker
      // but structural: the plan must contain bucketed scans for both
      // store tables and no Exchange whose child is one of those scans.
      val bucketedScans = "FileScan parquet .*neardup_probe_stream_t2".r
        .findAllIn(plan).size
      assert(bucketedScans >= 2,
        s"expected both store tables scanned, plan:\n$plan")
      val offenders = plan.linesIterator.zipWithIndex.filter(_._1
        .contains("Exchange")).map(_._2).filter { i =>
        val below = plan.linesIterator.slice(i + 1, i + 3).mkString("\n")
        below.contains("neardup_probe_stream_t2")
      }.toSeq
      assert(offenders.isEmpty,
        s"store-side exchange found at plan lines $offenders:\n$plan")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${BandStore.bandsTable(table)}")
      spark.sql(s"DROP TABLE IF EXISTS ${BandStore.shinglesTable(table)}")
    }
  }
}
