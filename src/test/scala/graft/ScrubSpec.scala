package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ScrubQueries

/** PII scrub operator: injection determinism, detection counts, complete
  * redaction, per-source rollup invariants. */
class ScrubSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  test("emails and urls are detected and fully redacted") {
    val df = Seq(
      "write to a.b-c_d@mail-host.org today",
      "docs at https://docs.example.com/a/b and http://x.co/y",
      "no pii here at all",
      "both bob@x.io and https://x.io/profile").toDF("text")
      .withColumn("n_emails",
        size(regexp_extract_all(col("text"), lit(ScrubQueries.EmailRe), lit(0))))
      .withColumn("n_urls",
        size(regexp_extract_all(col("text"), lit(ScrubQueries.UrlRe), lit(0))))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(col("text"), ScrubQueries.EmailRe, "<EMAIL>"),
          ScrubQueries.UrlRe, "<URL>"))
    val rows = df.collect()
    assert(rows.map(_.getAs[Int]("n_emails")).toSeq == Seq(1, 0, 0, 1))
    assert(rows.map(_.getAs[Int]("n_urls")).toSeq == Seq(0, 2, 0, 1))
    // redacted text must carry no residual matches
    val residue = df.filter(
      size(regexp_extract_all(col("redacted"), lit(ScrubQueries.EmailRe), lit(0))) > 0 ||
        size(regexp_extract_all(col("redacted"), lit(ScrubQueries.UrlRe), lit(0))) > 0)
    assert(residue.count() == 0)
    assert(rows(3).getAs[String]("redacted") == "both <EMAIL> and <URL>")
  }

  test("q51 rollup matches the injection arithmetic") {
    val rows = ScrubQueries.q51PiiScrub(spark, sfDir).collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == 500)
    // every 7th doc (doc_id 0..499) carries exactly one injected email,
    // every 11th exactly one URL — corpus-wide totals are exact
    val expectEmails = (0 until 500).count(_ % 7 == 0)
    val expectUrls = (0 until 500).count(_ % 11 == 0)
    assert(rows.map(_.getAs[Long]("total_emails")).sum == expectEmails)
    assert(rows.map(_.getAs[Long]("total_urls")).sum == expectUrls)
    assert(rows.map(_.getAs[Long]("docs_with_email")).sum == expectEmails)
    assert(rows.map(_.getAs[Long]("docs_with_url")).sum == expectUrls)
    // redaction always shrinks text (placeholders are shorter than the
    // injected PII), and only PII docs shrink
    rows.foreach { r =>
      assert(r.getAs[Long]("chars_removed") > 0 ==
        (r.getAs[Long]("docs_with_email") + r.getAs[Long]("docs_with_url") > 0))
    }
    val again = ScrubQueries.q51PiiScrub(spark, sfDir).collect()
    assert(rows.sameElements(again))
  }
}
