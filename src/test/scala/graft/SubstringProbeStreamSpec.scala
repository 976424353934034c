package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SubstringStore
import graft.streaming.SubstringProbeStream

/** The substring-store live admission twin: verdicts streamed through
  * foreachBatch must agree row-for-row with the registered batch probe
  * (q358's operator) on the same doc log, and must be invariant to how
  * the log splits into micro-batches — statelessness per document is
  * the claim, so two different splits must give the same rows. */
class SubstringProbeStreamSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private val a = (r: Range) => r.map(i => s"a$i").mkString(" ")
  private val c = (r: Range) => r.map(i => s"c$i").mkString(" ")

  // the doc log: an excerpt dup (24 verbatim tokens of stored doc 1 in
  // fresh filler), a clean doc, a both-store-docs multi-match, and a
  // sub-K doc that cannot shingle (admits clean with zero matches)
  private val log: Seq[(Long, String)] = Seq(
    101L -> ((1 to 6).map(i => s"u$i").mkString(" ") + " " +
      a(5 to 28) + " " + (1 to 6).map(i => s"v$i").mkString(" ")),
    102L -> (1 to 30).map(i => s"w$i").mkString(" "),
    103L -> (a(1 to 20) + " " + c(1 to 20)),
    104L -> "just five short tokens here")

  private def key(r: org.apache.spark.sql.Row) =
    r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_matched_store_docs"),
        r.getAs[Long]("longest_span_tokens"),
        r.getAs[Long]("best_store_doc"), r.getAs[Int]("is_dup")))

  private def streamVerdicts(split: Seq[Seq[(Long, String)]],
      store: org.apache.spark.sql.DataFrame, tag: String) = {
    val out = Files.createTempDirectory(s"graft-sps-out-$tag").toString
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = SubstringProbeStream.start(
      mem.toDF().toDF("doc_id", "text"), store, out)
    try
      split.foreach { epoch =>
        mem.addData(epoch: _*)
        q.processAllAvailable()
      }
    finally q.stop()
    spark.read.parquet(out).collect().map(key).toMap
  }

  test("streamed verdicts equal the batch probe, for any batch split") {
    val base = Files.createTempDirectory("graft-sps")
    val table = "substr_probe_stream_t1"
    try {
      SubstringStore.writeStore(
        docsDf(1L -> a(1 to 40), 2L -> c(1 to 40)),
        table, base.resolve("s").toString)
      val store = spark.table(table)
      val batch = SubstringStore.probeStore(docsDf(log: _*), store)
        .collect().map(key).toMap

      // split A: one epoch per document; split B: 2 + 2
      val byOne = streamVerdicts(log.map(Seq(_)), store, "one")
      val byTwo = streamVerdicts(log.grouped(2).toSeq, store, "two")

      assert(batch.keySet == Set(101L, 102L, 103L, 104L))
      assert(byOne == batch, "per-doc epochs must replay the batch probe")
      assert(byTwo == batch, "the split must not change any verdict")
      // spot-pin the semantics so agreement isn't vacuous
      assert(batch(101L) == ((1L, 24L, 1L, 1)))
      assert(batch(102L) == ((0L, 0L, -1L, 0)))
      assert(batch(103L)._1 == 2L && batch(103L)._4 == 1)
      assert(batch(104L) == ((0L, 0L, -1L, 0)))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
