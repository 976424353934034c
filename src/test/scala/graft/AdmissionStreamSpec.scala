package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AdmissionStream

/** The live admission gate must agree with q400's batch gate stages:
  * on a corpus whose ids dodge every q400 injection class (so the batch
  * ledger runs on exactly this corpus), the streamed verdict counts per
  * reject reason must equal the ledger's s0→s1 (quality), s1→s2
  * (perplexity), and s2→s3 (loop) drops, with the admitted count equal
  * to s3 — and the three planted pathologies must each carry their own
  * reason. The scoring LM is the same frozen artifact on both sides
  * (self-trained on the quality-passed corpus). */
class AdmissionStreamSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // ids ≡ 2 (mod 10), filtered clear of %8==5 / %9==4 / %6==1 / %10∈{3,7}
  private val safeIds = (2L to 2000L by 10L)
    .filter(id => id % 8 != 5 && id % 9 != 4 && id % 6 != 1)
    .take(32).toVector

  // 29 clean docs: 120 tokens each over a shared 600-word vocabulary,
  // arranged with stride 7 so no token repeats within a doc (no loops)
  // while every vocab word recurs across docs (low NLL)
  private def cleanDoc(d: Int): String =
    (0 until 120).map(i => s"w${(d * 37 + i * 7) % 600}").mkString(" ")

  private lazy val rows: Seq[(Long, String, String)] = {
    val clean = safeIds.take(29).zipWithIndex.map { case (id, d) =>
      (id, cleanDoc(d), "en")
    }
    val lowQ = (safeIds(29), "the a", "en")
    val gibberish = (safeIds(30),
      (1 to 40).map(i => s"zzq${i}x").mkString(" "), "en")
    val loop = (safeIds(31),
      cleanDoc(50).split(" ").take(60).mkString(" ") + " " +
        Seq.fill(3)((0 until 10).map(i => s"w$i").mkString(" "))
          .mkString(" "), "en")
    clean :+ lowQ :+ gibberish :+ loop
  }

  test("streamed verdicts reproduce q400's batch gate drops reason-for-reason") {
    val dir = Files.createTempDirectory("graft-admission").toString
    rows.toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")

    // batch side: the registered ledger on the uninjected corpus
    val ledger = graft.queries.CurationPipeline.q400CurationV2(spark, dir)
      .collect().map(r => r.getAs[Int]("stage_no") ->
        r.getAs[Long]("n_docs")).toMap
    assert(ledger(0) == rows.length.toLong,
      "no injection class may fire on the safe-id corpus")

    // the frozen LM artifact: self-trained on the quality-passed corpus
    // (q400's s1), the same frame both sides score against
    val s1 = rows.filter { case (_, text, _) =>
      val t = AdmissionStream.tokenize(text)
      t.nonEmpty && AdmissionStream.quality(t) >= AdmissionStream.QualityMin
    }
    val train = s1.map(r => (r._1, AdmissionStream.tokenize(r._2).toSeq))
      .toDF("doc_id", "toks")
    val (lp, floor) = AdmissionStream.lmIndex(train)

    // stream the log in two epochs through a memory sink
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = AdmissionStream.verdicts(
        mem.toDF().toDF("doc_id", "text"), lp, floor)
      .writeStream.format("memory").queryName("admission_verdicts")
      .outputMode("append").start()
    val log = rows.map(r => (r._1, r._2))
    try {
      mem.addData(log.take(16): _*)
      q.processAllAvailable()
      mem.addData(log.drop(16): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("admission_verdicts").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.size == rows.length)

    // reason-for-reason agreement with the ledger
    def reason(n: String) = got.values.count(_.getAs[String]("reject_reason") == n)
    assert(reason("quality").toLong == ledger(0) - ledger(1))
    assert(reason("perplexity").toLong == ledger(1) - ledger(2))
    assert(reason("loop").toLong == ledger(2) - ledger(3))
    assert(got.values.count(_.getAs[Boolean]("admitted")).toLong == ledger(3))

    // the planted pathologies carry their own reasons
    assert(got(safeIds(29)).getAs[String]("reject_reason") == "quality")
    assert(got(safeIds(30)).getAs[String]("reject_reason") == "perplexity")
    assert(got(safeIds(31)).getAs[String]("reject_reason") == "loop")
    assert(got(safeIds(0)).getAs[Boolean]("admitted"))
  }
}
