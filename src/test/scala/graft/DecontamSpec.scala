package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DecontamQueries

/** q48 decontamination + q49 repetition signals vs brute-force ground
  * truth computed independently in plain Scala (no Spark expressions, no
  * shared shingle code paths). */
class DecontamSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def fixtureDocs(): Array[(Long, String, String)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def toks(t: String): Seq[String] = {
    val s = t.trim
    if (s.isEmpty) Seq.empty else s.split("\\s+").toSeq
  }

  private def grams(t: String, n: Int): Seq[String] = {
    val tk = toks(t)
    if (tk.length < n) Seq(tk.mkString(" "))
    else tk.sliding(n).map(_.mkString(" ")).toSeq
  }

  test("q48 matches a brute-force overlap computation; holdout excluded") {
    val docs = fixtureDocs()
    val holdout: Set[String] = docs.filter(_._1 % 10 == 7)
      .flatMap(d => grams(d._3, 3).distinct).toSet
    assert(holdout.nonEmpty, "fixture holdout is empty; q48 checks nothing")
    val expected = docs.filter(_._1 % 10 != 7).map { case (id, _, t) =>
      val sh = grams(t, 3).distinct
      val hit = sh.count(holdout.contains)
      (id, sh.length, hit.toLong, hit.toDouble / sh.length)
    }.sortBy(_._1)
    val rows = DecontamQueries.q48Decontam(spark, sfDir).collect()
    val got = rows
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_shingles"),
        r.getAs[Long]("n_hit"), r.getAs[Double]("overlap_frac")))
    assert(got.toSeq == expected.toSeq)
    // the verdict column is a pure function of overlap_frac
    rows.foreach { r =>
      assert((r.getAs[Int]("drop_doc") == 1) ==
        (r.getAs[Double]("overlap_frac") >= 0.5))
    }
    // with a 31-word vocabulary the corpus MUST show real contamination,
    // and a report that flags everything is as broken as one that flags
    // nothing
    val fracs = got.map(_._4)
    assert(fracs.exists(_ > 0.0) && fracs.exists(_ < 0.5))
  }

  test("q49 matches brute-force repetition stats") {
    val docs = fixtureDocs()
    val expected = docs.map { case (id, _, t) =>
      val lines = t.split("\n", -1).toSeq
      val g = grams(t, 2)
      val counts = g.groupBy(identity).map(_._2.size)
      (id, lines.length,
        (lines.length - lines.distinct.length).toDouble / lines.length,
        g.length.toLong,
        (g.length - g.distinct.length).toDouble / g.length,
        counts.max.toDouble / g.length)
    }.sortBy(_._1)
    val got = DecontamQueries.q49Repetition(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_lines"),
        r.getAs[Double]("dup_line_frac"), r.getAs[Long]("n_2grams"),
        r.getAs[Double]("dup_2gram_frac"), r.getAs[Double]("top_2gram_mass")))
    assert(got.toSeq == expected.toSeq)
    // the tiny vocabulary forces real 2-gram repetition — the signal must
    // actually vary on the fixture, not sit at a constant
    assert(got.map(_._5).distinct.length > 1)
  }
}
