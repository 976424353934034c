package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{BandStore, IncrementalDedup}
import graft.streaming.{AdmissionStream, ContamStream, CurationGateStream}

/** The composed live curation gate (VERDICT r16 #1): ONE foreachBatch
  * chain of quality → perplexity → loop → contamination → exact-hash →
  * near-dup against frozen artifacts must (a) name q432's stage
  * semantics per document — every stage pinned by a purpose-built
  * arrival, (b) agree row-for-row between the batch call and the
  * streamed replay, and (c) be invariant to how the log splits into
  * micro-batches — the per-document purity claim that justifies
  * excluding q432's cross-document election stages from the live path. */
class LiveGateStreamSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private val a = (r: Range) => r.map(i => s"a$i").mkString(" ")
  private val b = (r: Range) => r.map(i => s"b$i").mkString(" ")

  test("the composed gate names q432's stage chain per doc, batch == stream, for any micro-batch split") {
    val base = Files.createTempDirectory("graft-lgs")
    val fpT = "live_gate_fp_t1"
    val bandT = "live_gate_band_t1"
    try {
      // store corpus: 2000 singleton tokens, so every in-vocab doc
      // scores avg_nll = |ln 1/2000| ≈ 7.60 < 8 and every all-OOV doc
      // scores the floor ≈ 8.29 > 8 — the DEFAULT operating point
      // separates them (unlike the fixture corpus, see Q437NllMax)
      val doc1 = a(1 to 1000)
      val doc2 = (1 to 960).map(i => s"c$i").mkString(" ") + " " +
        b(1 to 40)
      val body = docsDf(1L -> doc1, 2L -> doc2)
      val bench = docsDf(7L -> b(1 to 40))
      val (lp, floor) = AdmissionStream.lmIndex(body.select(col("doc_id"),
        TextFunctions.tokens(lower(col("text"))).as("toks")))
      val contamIdx = ContamStream.benchIndex(bench)
      IncrementalDedup.writeStore(
        body.select(TextFunctions.fingerprint(col("text")).as("fp")),
        fpT, base.resolve("fp").toString)
      BandStore.writeStore(body, bandT, base.resolve("band").toString)
      val fpStore = spark.table(fpT)
      val bands = spark.table(BandStore.bandsTable(bandT))
      val shingles = spark.table(BandStore.shinglesTable(bandT))

      // one arrival per stage, plus the admitted and the empty doc
      val log: Seq[(Long, String)] = Seq(
        201L -> "the a", // composite < 0.5
        202L -> (1 to 40).map(i => s"g$i").mkString(" "), // all-OOV
        203L -> (a(1 to 50) + " " + a(1 to 10) + " " + a(1 to 10) +
          " " + a(1 to 10)), // 30-token tandem repeat, period 10
        204L -> (a(1 to 20) + " " + b(1 to 30)), // 30-token bench leak
        205L -> doc1, // verbatim re-delivery
        206L -> (doc1 + " zzx1 zzx2 zzx3"), // near-clone, J ≈ 0.997
        207L -> (1 to 1000).reverse.map(i => s"a$i").mkString(" "),
        208L -> "") // reversed: same LM mass, disjoint shingles; empty
      def key(r: Row) = r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[String]("drop_stage"),
          r.getAs[Int]("admitted")))
      val expected = Map(
        201L -> ((2L, "quality", 0)),
        202L -> ((40L, "perplexity", 0)),
        203L -> ((80L, "loop_gate", 0)),
        204L -> ((50L, "contam_gate", 0)),
        205L -> ((1000L, "exact_dedup", 0)),
        206L -> ((1003L, "near_dup", 0)),
        207L -> ((1000L, "", 1)),
        208L -> ((0L, "quality", 0)))

      val batch = CurationGateStream.verdicts(docsDf(log: _*), lp, floor,
        contamIdx, fpStore, bands, shingles).collect().map(key).toMap
      assert(batch == expected,
        s"batch chain must name every stage:\n$batch")

      def streamed(split: Seq[Seq[(Long, String)]], tag: String) = {
        val out = Files.createTempDirectory(s"graft-lgs-out-$tag").toString
        implicit val sc = spark.sqlContext
        val mem = MemoryStream[(Long, String)]
        val q = CurationGateStream.start(mem.toDF().toDF("doc_id", "text"),
          lp, floor, contamIdx, fpStore, bands, shingles, out)
        try
          split.foreach { e => mem.addData(e: _*); q.processAllAvailable() }
        finally q.stop()
        spark.read.parquet(out).drop("batch_id").collect().map(key).toMap
      }
      // split A: one doc per epoch; split B: epochs of 3
      assert(streamed(log.map(Seq(_)), "one") == expected,
        "per-doc epochs must replay the batch chain")
      assert(streamed(log.grouped(3).toSeq, "grp") == expected,
        "the micro-batch split must not change any verdict")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $fpT")
      spark.sql(s"DROP TABLE IF EXISTS ${BandStore.bandsTable(bandT)}")
      spark.sql(s"DROP TABLE IF EXISTS ${BandStore.shinglesTable(bandT)}")
    }
  }
}
