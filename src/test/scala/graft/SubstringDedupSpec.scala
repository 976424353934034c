package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SubstringQueries

/** q350's stitching contract on a CONSTRUCTED corpus (the oracle hash
  * certifies arithmetic parity on the real corpus; this spec certifies
  * the span geometry): a single shared run recovers its exact length
  * and both start offsets; two same-diagonal runs separated by a gap
  * stay two islands; a shared run below L is excluded. Doc ids avoid
  * multiples of 10 so the fixture corpus gains no near-dup clones. */
class SubstringDedupSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val rows = {
    val dir = Files.createTempDirectory("graft-substr")
    val a = (t: Int) => s"a$t"
    // doc 1: a1..a60
    val d1 = (1 to 60).map(a).mkString(" ")
    // doc 2: 9 unique tokens, then a11..a40 (30 shared, at pos 9), tail
    val d2 = ((1 to 9).map(j => s"x$j") ++ (11 to 40).map(a) ++
      (1 to 20).map(j => s"y$j")).mkString(" ")
    // doc 3: a1..a20, a 10-token gap, a31..a50 — two runs on diagonal 0
    val d3 = ((1 to 20).map(a) ++ (1 to 10).map(j => s"z$j") ++
      (31 to 50).map(a)).mkString(" ")
    Seq((1L, d1, "en"), (2L, d2, "en"), (3L, d3, "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    SubstringQueries.q350SubstringDedup(spark, dir.toString).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r).toMap
  }

  test("a single shared run yields one island with exact length and offsets") {
    val r = rows((1L, 2L))
    assert(r.getAs[Long]("longest_span_tokens") == 30L)
    assert(r.getAs[Long]("n_islands") == 1L)
    assert(r.getAs[Long]("n_matched_shingles") == 23L) // 30 - 8 + 1
    assert(r.getAs[Long]("a_start") == 10L, "a11 sits at doc-1 position 10")
    assert(r.getAs[Long]("b_start") == 9L, "a11 sits at doc-2 position 9")
  }

  test("two same-diagonal runs split by a gap remain two islands") {
    val r = rows((1L, 3L))
    assert(r.getAs[Long]("n_islands") == 2L)
    assert(r.getAs[Long]("longest_span_tokens") == 20L)
    assert(r.getAs[Long]("n_matched_shingles") == 26L) // 13 + 13
    // equal-length runs tie-break to the earlier start
    assert(r.getAs[Long]("a_start") == 0L &&
      r.getAs[Long]("b_start") == 0L)
  }

  test("pairs whose longest span is under L are excluded") {
    // docs 2 and 3 share a11..a20 and a31..a40: 10-token runs < L = 16
    assert(!rows.contains((2L, 3L)))
    assert(rows.keySet == Set((1L, 2L), (1L, 3L)))
  }

  // ------------------------------------------------------------- q351
  // Same fixture, removal-mask side: doc 1 is the earliest (keeper, no
  // mask row); doc 2 masks its single 30-token excerpt; doc 3 masks two
  // disjoint regions (the 10-token z-gap keeps them from merging); the
  // sub-L runs of pair (2,3) contribute nothing.
  private lazy val maskRows = {
    val dir = Files.createTempDirectory("graft-substr-mask")
    val a = (t: Int) => s"a$t"
    val d1 = (1 to 60).map(a).mkString(" ")
    val d2 = ((1 to 9).map(j => s"x$j") ++ (11 to 40).map(a) ++
      (1 to 20).map(j => s"y$j")).mkString(" ")
    val d3 = ((1 to 20).map(a) ++ (1 to 10).map(j => s"z$j") ++
      (31 to 50).map(a)).mkString(" ")
    Seq((1L, d1, "en"), (2L, d2, "en"), (3L, d3, "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    SubstringQueries.q351RemovalMask(spark, dir.toString).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("the earliest document of every pair carries no removal mask") {
    assert(maskRows.keySet == Set(2L, 3L), "doc 1 keeps; 2 and 3 mask")
  }

  test("a single excerpt yields one region with exact coverage") {
    val r = maskRows(2L)
    assert(r.getAs[Long]("n_regions") == 1L)
    assert(r.getAs[Long]("covered_tokens") == 30L, "a11..a40 at pos 9..38")
    assert(r.getAs[Long]("n_tokens") == 59L)
    assert(math.abs(r.getAs[Double]("removable_frac") - 30.0 / 59) < 1e-6)
  }

  test("gap-separated spans stay two regions; coverage sums exactly") {
    val r = maskRows(3L)
    assert(r.getAs[Long]("n_regions") == 2L, "positions 0..19 and 30..49")
    assert(r.getAs[Long]("covered_tokens") == 40L)
    assert(r.getAs[Double]("removable_frac") == 0.8)
  }

  // ------------------------------------------------------------- q352
  // Benchmark contamination fixture: bench docs 7 (b1..b40) and
  // 17 (d1..d40); corpus docs exercise the injected leak (doc 3 gains
  // b1..b30 by construction), an organic verbatim quote (doc 11), a
  // gap-split two-region doc (doc 21), an ADJACENT cross-bench pair
  // that must merge to one region (doc 31), and a clean doc (doc 12).
  private lazy val contamRows = {
    val dir = Files.createTempDirectory("graft-substr-contam")
    val b = (t: Int) => s"b$t"; val d = (t: Int) => s"d$t"
    val mk = (xs: Seq[String]) => xs.mkString(" ")
    Seq(
      (7L, mk((1 to 40).map(b)), "en"),
      (17L, mk((1 to 40).map(d)), "en"),
      (3L, mk((1 to 20).map(j => s"c$j")), "en"),
      (11L, mk((1 to 5).map(j => s"u$j") ++ (5 to 24).map(b) ++
        (1 to 5).map(j => s"v$j")), "en"),
      (12L, mk((1 to 20).map(j => s"z$j")), "en"),
      (21L, mk((1 to 26).map(b) ++ (1 to 10).map(j => s"x$j") ++
        (1 to 26).map(b)), "en"),
      (31L, mk((1 to 20).map(b) ++ (1 to 20).map(d)), "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    SubstringQueries.q352ContamSpans(spark, dir.toString).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("clean docs and bench docs are absent; the leak set is exact") {
    assert(contamRows.keySet == Set(3L, 11L, 21L, 31L))
  }

  test("the injected 30-token leak is recovered span-exactly") {
    val r = contamRows(3L)
    assert(r.getAs[Long]("n_tokens") == 50L, "20 own + 30 injected")
    assert(r.getAs[Long]("n_regions") == 1L)
    assert(r.getAs[Long]("contam_tokens") == 30L)
    assert(r.getAs[Long]("longest_contam_tokens") == 30L)
    assert(r.getAs[Double]("contam_frac") == 0.6)
  }

  test("an embedded verbatim quote masks exactly its own extent") {
    val r = contamRows(11L)
    assert(r.getAs[Long]("contam_tokens") == 20L &&
      r.getAs[Long]("n_regions") == 1L)
    assert(math.abs(r.getAs[Double]("contam_frac") - 0.666667) < 1e-9,
      "20 of 30 tokens, 6-dp snap")
  }

  test("a gap keeps two regions; repeated quotes both count") {
    val r = contamRows(21L)
    assert(r.getAs[Long]("n_regions") == 2L)
    assert(r.getAs[Long]("contam_tokens") == 52L)
    assert(r.getAs[Long]("longest_contam_tokens") == 26L)
  }

  test("adjacent spans from two different bench docs merge to one region") {
    val r = contamRows(31L)
    assert(r.getAs[Long]("n_regions") == 1L, "[0,19] + [20,39] are adjacent")
    assert(r.getAs[Long]("contam_tokens") == 40L)
    assert(r.getAs[Double]("contam_frac") == 1.0)
    assert(r.getAs[Long]("longest_contam_tokens") == 20L,
      "merge is mask-level; no single span crosses the bench boundary")
  }

  // ------------------------------------------------------------- q392
  // Same fixture as q351: doc 1 keeps all 60 tokens, doc 2 excises its
  // 30-token excerpt, doc 3 excises both 20-token regions. The cert row
  // must reconcile the ledger exactly and the re-run detector must find
  // the cleaned corpus span-free.
  private lazy val certRow = {
    val dir = Files.createTempDirectory("graft-substr-cert")
    val a = (t: Int) => s"a$t"
    val d1 = (1 to 60).map(a).mkString(" ")
    val d2 = ((1 to 9).map(j => s"x$j") ++ (11 to 40).map(a) ++
      (1 to 20).map(j => s"y$j")).mkString(" ")
    val d3 = ((1 to 20).map(a) ++ (1 to 10).map(j => s"z$j") ++
      (31 to 50).map(a)).mkString(" ")
    Seq((1L, d1, "en"), (2L, d2, "en"), (3L, d3, "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    SubstringQueries.q392RewriteCert(spark, dir.toString).collect().head
  }

  test("the rewrite ledger reconciles token mass exactly") {
    assert(certRow.getAs[Long]("n_docs") == 3L)
    assert(certRow.getAs[Long]("docs_rewritten") == 2L)
    assert(certRow.getAs[Long]("tokens_in") == 169L, "60 + 59 + 50")
    assert(certRow.getAs[Long]("tokens_removed") == 70L, "30 + (20 + 20)")
    assert(certRow.getAs[Long]("tokens_out") == 99L)
    assert(certRow.getAs[Boolean]("mass_conserved"))
  }

  test("the cleaned corpus carries zero residual cross-doc spans") {
    assert(certRow.getAs[Long]("residual_pairs") == 0L)
    assert(certRow.getAs[Boolean]("residual_clean"))
  }

  // ------------------------------------------------------------- q393
  // Constructed loops: doc 1 = 30 unique tokens + a 10-token block
  // repeated 3×; doc 2 clean; doc 3 = a 20-token block repeated twice
  // (the whole doc is the loop); doc 4 = a 10-token block repeated
  // twice — the repeated SPAN is only 10 tokens, under L; doc 13
  // (13 % 8 == 5) exercises the fixture injection (3 appended copies of
  // its first 10 tokens). Ids otherwise avoid % 8 == 5.
  private lazy val loopRows = {
    val dir = Files.createTempDirectory("graft-selfrep")
    val mk = (p: String, r: Range) => r.map(i => s"$p$i").mkString(" ")
    val block = (p: String, n: Int) => mk(p, 1 to n)
    Seq(
      (1L, mk("w", 1 to 30) + " " + Seq.fill(3)(block("r", 10)).mkString(" "),
        "en"),
      (2L, mk("q", 1 to 40), "en"),
      (3L, block("s", 20) + " " + block("s", 20), "en"),
      (4L, block("b", 10) + " " + block("b", 10), "en"),
      (13L, mk("u", 1 to 12), "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    SubstringQueries.q393SelfRepeats(spark, dir.toString).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("clean and sub-L-repeat docs are absent; the loop set is exact") {
    assert(loopRows.keySet == Set(1L, 3L, 13L))
  }

  test("a 3-copy tandem block recovers span, period, and coverage exactly") {
    val r = loopRows(1L)
    assert(r.getAs[Long]("n_tokens") == 60L)
    assert(r.getAs[Long]("n_loops") == 1L)
    assert(r.getAs[Long]("longest_loop_tokens") == 20L,
      "13 consecutive gap-10 matches → 13 + K − 1")
    assert(r.getAs[Long]("loop_period") == 10L)
    assert(r.getAs[Double]("loop_frac") == 0.5, "[30, 59] of 60 tokens")
  }

  test("a whole-doc two-copy loop covers the full document") {
    val r = loopRows(3L)
    assert(r.getAs[Long]("longest_loop_tokens") == 20L)
    assert(r.getAs[Long]("loop_period") == 20L)
    assert(r.getAs[Double]("loop_frac") == 1.0)
  }

  test("the fixture injection flags with the expected geometry") {
    val r = loopRows(13L)
    assert(r.getAs[Long]("n_tokens") == 42L, "12 own + 3 × 10 appended")
    assert(r.getAs[Long]("longest_loop_tokens") == 20L)
    assert(r.getAs[Long]("loop_period") == 10L)
    assert(math.abs(r.getAs[Double]("loop_frac") - 30.0 / 42) < 1e-6,
      "[12, 41] of 42 tokens")
  }
}
