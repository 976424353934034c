package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BandStore

/** BandStore maintenance pair (append + takedown GC): the band store
  * now has the same lifecycle discipline as the fingerprint store (q94)
  * and the substring position store (q358 + SubstringGcSpec) — appends
  * become visible to the next probe without disturbing the bucketing,
  * and retiring a document removes its verdicts from BOTH bucketed
  * tables while preserving every unrelated verdict. */
class BandStoreLifecycleSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private val a = (r: Range) => r.map(i => s"a$i").mkString(" ")
  private val c = (r: Range) => r.map(i => s"c$i").mkString(" ")
  private val e = (r: Range) => r.map(i => s"e$i").mkString(" ")

  private def verdicts(probe: org.apache.spark.sql.DataFrame) =
    probe.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Int]("is_near_dup"), r.getAs[Long]("best_match")))).toMap

  test("append is probe-visible; retire removes only the retired doc's verdicts") {
    val base = Files.createTempDirectory("graft-bsl")
    val t1 = "band_lifecycle_t1"
    val t2 = "band_lifecycle_t2"
    try {
      BandStore.writeStore(
        docsDf(1L -> a(1 to 40), 2L -> c(1 to 40)),
        t1, base.resolve("s").toString)
      // a batch with one near-clone per eventual store doc
      val log = docsDf(
        101L -> (a(1 to 40) + " zz tail"),
        102L -> (c(1 to 40) + " zz tail"),
        103L -> (e(1 to 40) + " zz tail"))
      def probe(table: String) = verdicts(BandStore.probeStore(log,
        spark.table(BandStore.bandsTable(table)),
        spark.table(BandStore.shinglesTable(table))))

      val v0 = probe(t1)
      assert(v0(101L) == ((1, 1L)) && v0(102L) == ((1, 2L)))
      assert(v0(103L) == ((0, -1L)), "doc 3 not admitted yet")

      // append doc 3: its clone must now flag, nothing else changes
      BandStore.appendToStore(docsDf(3L -> e(1 to 40)), t1,
        base.resolve("s").toString)
      val v1 = probe(t1)
      assert(v1(103L) == ((1, 3L)), "appended doc must be probe-visible")
      assert(v1(101L) == v0(101L) && v1(102L) == v0(102L))

      // re-delivering an admitted doc (at-least-once flows) must be a
      // no-op: the anti-join guard keeps one shingle row per doc_id, so
      // a clone still sees exactly ONE candidate store doc
      BandStore.appendToStore(docsDf(3L -> e(1 to 40)), t1,
        base.resolve("s").toString)
      val v1b = probe(t1)
      assert(v1b == v1, "re-append must not change any verdict")
      val cand103 = BandStore.probeStore(log,
        spark.table(BandStore.bandsTable(t1)),
        spark.table(BandStore.shinglesTable(t1)))
        .where("doc_id = 103").select("n_candidates")
        .head().getLong(0)
      assert(cand103 == 1L,
        s"duplicate admission would double-count candidates: $cand103")

      // retire doc 1 into a new generation: its clone admits clean,
      // the other verdicts are untouched
      BandStore.retireFromStore(spark, t1, Seq(1L).toDF("doc_id"),
        t2, base.resolve("g").toString)
      val v2 = probe(t2)
      assert(v2(101L) == ((0, -1L)), "retired doc must stop flagging")
      assert(v2(102L) == ((1, 2L)) && v2(103L) == ((1, 3L)),
        "unrelated verdicts must survive the generation swap")

      // the swapped generation preserves both buckettings: no Exchange
      // feeds either store scan
      val plan = BandStore.probeStore(log,
        spark.table(BandStore.bandsTable(t2)),
        spark.table(BandStore.shinglesTable(t2)))
        .queryExecution.executedPlan.toString()
      val lines = plan.linesIterator.toVector
      val offenders = lines.zipWithIndex
        .filter(_._1.contains("Exchange")).map(_._2)
        .filter(i => lines.slice(i + 1, i + 3)
          .exists(_.contains("band_lifecycle_t2")))
      assert(offenders.isEmpty,
        s"store-side exchange after GC at plan lines $offenders:\n$plan")
    } finally {
      Seq(t1, t2).foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS ${BandStore.bandsTable(t)}")
        spark.sql(s"DROP TABLE IF EXISTS ${BandStore.shinglesTable(t)}")
      }
    }
  }

  test("at-least-once dedup INSIDE one batch: a doubly-delivered doc appends once and a repeated probe doc_id emits one verdict row") {
    val base = Files.createTempDirectory("graft-bsl2")
    val t = "band_lifecycle_t3"
    try {
      BandStore.writeStore(docsDf(1L -> a(1 to 40)), t,
        base.resolve("s").toString)
      // the same admitted doc twice in ONE batch — the store-only guard
      // would pass both copies and double every later candidate count
      BandStore.appendToStore(
        docsDf(5L -> c(1 to 40), 5L -> c(1 to 40)), t,
        base.resolve("s").toString)
      assert(spark.table(BandStore.shinglesTable(t))
        .where("doc_id = 5").count() == 1L,
        "in-batch duplicate must append ONE shingle row")
      assert(spark.table(BandStore.bandsTable(t))
        .where("doc_id = 5").count() == 8L,
        "in-batch duplicate must append ONE band set (8 rows)")
      val probe = BandStore.probeStore(
        docsDf(201L -> (c(1 to 40) + " zz tail"),
          201L -> (c(1 to 40) + " zz tail")),
        spark.table(BandStore.bandsTable(t)),
        spark.table(BandStore.shinglesTable(t)))
      val rows = probe.collect()
      assert(rows.length == 1, s"one verdict row per distinct doc: ${rows.length}")
      assert(rows.head.getAs[Long]("n_candidates") == 1L &&
        rows.head.getAs[Int]("is_near_dup") == 1 &&
        rows.head.getAs[Long]("best_match") == 5L)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${BandStore.bandsTable(t)}")
      spark.sql(s"DROP TABLE IF EXISTS ${BandStore.shinglesTable(t)}")
    }
  }
}
