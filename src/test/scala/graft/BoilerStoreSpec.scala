package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BoilerStore
import graft.streaming.BoilerProbeStream

/** The boilerplate-fingerprint store (q450's operator) and its live
  * admission twin: lifecycle semantics (append promotes a template to
  * boilerplate; retire demotes it exactly — incidence, not counts; the
  * idempotence guard survives an in-batch duplicate), and the streamed
  * verdicts must equal the registered batch probe on the same log under
  * two different micro-batch splits. */
class BoilerStoreSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  // "ntp00 … ntp23": CDC breaks at 3/12/18/23 → four internal chunks of
  // 4/9/6/5 tokens, all ≥ CdcMinLen, host-independent (RetrievalSpec's
  // planted-template family)
  private val Ntp = (0 until 24).map(i => f"ntp$i%02d").mkString(" ")
  private def host(i: Int, words: Int = 30): String =
    (0 until words).map(j => s"h${i}w$j").mkString(" ")

  private def key(r: org.apache.spark.sql.Row) =
    r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_eligible"),
        r.getAs[Long]("n_boiler_chunks"), r.getAs[Long]("boiler_tokens"),
        r.getAs[Long]("doc_tokens"), r.getAs[Int]("is_clean")))

  test("lifecycle: append promotes the template, retire demotes it exactly, " +
    "and the guard survives an in-batch duplicate") {
    val base = Files.createTempDirectory("graft-boiler")
    val table = "boiler_store_spec_t1"
    val gc = "boiler_store_spec_gc1"
    try {
      // generation 1: five template-free hosts
      BoilerStore.writeStore(
        docsDf((1L to 5L).map(i => i -> host(i.toInt)): _*),
        table, base.resolve("s").toString)
      val probe = docsDf(900L -> s"$Ntp ${host(900)}")
      def verdict(t: String) =
        BoilerStore.probeStore(probe, spark.table(BoilerStore.incTable(t)))
          .collect().map(key).toMap.apply(900L)
      val v1 = verdict(table)
      assert(v1._6 == 1 && v1._3 == 0L, s"unknown template must be clean: $v1")
      // append a 5-host wave carrying the template — delivered with an
      // in-batch duplicate of one doc (the at-least-once case): df must
      // count it ONCE, so the template's df is exactly 5 = B
      val wave = (11L to 15L).map(i => i -> s"$Ntp ${host(i.toInt)}")
      BoilerStore.appendToStore(
        docsDf((wave :+ wave.head): _*), table, base.resolve("s").toString)
      val v2 = verdict(table)
      assert(v2._6 == 0 && v2._3 == 4L && v2._4 == 24L,
        s"after the wave, all four template chunks (24 tokens) must flag: $v2")
      // a duplicate-inflated df would already have promoted at 4 hosts;
      // retire ONE host → df = 4 < B → the template must demote
      BoilerStore.retireFromStore(spark, table, Seq(11L).toDF("doc_id"),
        gc, base.resolve("g").toString)
      val v3 = verdict(gc)
      assert(v3 == v1, s"retiring below B must restore the clean verdict: $v3")
    } finally {
      Seq(BoilerStore.incTable(table), BoilerStore.docsTable(table),
        BoilerStore.incTable(gc), BoilerStore.docsTable(gc))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("streamed verdicts equal the batch probe, for any batch split") {
    val base = Files.createTempDirectory("graft-boiler-s")
    val table = "boiler_store_spec_t2"
    try {
      // store: 6 hosts carrying the template (df = 6 ≥ B) + 2 clean
      BoilerStore.writeStore(
        docsDf(((1L to 6L).map(i => i -> s"$Ntp ${host(i.toInt)}") ++
          Seq(7L -> host(7), 8L -> host(8))): _*),
        table, base.resolve("s").toString)
      val inc = spark.table(BoilerStore.incTable(table))
      // the log: a template carrier (flags), a clean novel doc, a doc of
      // ONLY template text, and an empty-text doc (all-zero clean row)
      val log: Seq[(Long, String)] = Seq(
        901L -> s"$Ntp ${host(901)}",
        902L -> host(902),
        903L -> Ntp,
        904L -> "   ")
      val batch = BoilerStore.probeStore(docsDf(log: _*), inc)
        .collect().map(key).toMap
      def streamed(split: Seq[Seq[(Long, String)]], tag: String) = {
        val out = Files.createTempDirectory(s"graft-bps-out-$tag").toString
        implicit val sc = spark.sqlContext
        val mem = MemoryStream[(Long, String)]
        val q = BoilerProbeStream.start(
          mem.toDF().toDF("doc_id", "text"), inc, out)
        try
          split.foreach { epoch =>
            mem.addData(epoch: _*)
            q.processAllAvailable()
          }
        finally q.stop()
        spark.read.parquet(out).collect().map(key).toMap
      }
      val byOne = streamed(log.map(Seq(_)), "one")
      val byTwo = streamed(log.grouped(2).toSeq, "two")
      assert(batch.keySet == Set(901L, 902L, 903L, 904L))
      assert(byOne == batch, "per-doc epochs must replay the batch probe")
      assert(byTwo == batch, "the split must not change any verdict")
      // pin the semantics so agreement isn't vacuous
      val carrier = batch(901L)
      assert(carrier._6 == 0 && carrier._3 == 4L && carrier._4 == 24L,
        s"template carrier must flag its four template chunks: $carrier")
      assert(batch(902L)._6 == 1 && batch(902L)._3 == 0L)
      val pure = batch(903L)
      assert(pure._6 == 0 && pure._4 == pure._5,
        s"an all-template doc must be 100% boilerplate: $pure")
      assert(batch(904L) == ((0L, 0L, 0L, 0L, 0L, 1)),
        "empty-text doc must get the all-zero clean row")
    } finally {
      Seq(BoilerStore.incTable(table), BoilerStore.docsTable(table))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
