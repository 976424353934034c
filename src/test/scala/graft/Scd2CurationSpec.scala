package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2
import graft.queries.CurationQueries

/** SCD2 history collapse (q54) and the corpus-curation trio
  * (q55 containment, q56 quota, q57 deterministic shuffle). */
class Scd2CurationSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  private def collapse(rows: Seq[(Int, Int, Int, String)]) =
    Scd2.collapse(rows.toDF("k", "o", "t", "a"),
        col("k"), col("o"), col("t"), col("a"))
      .collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Long]("version"),
        r.getAs[String]("value"), r.getAs[Int]("valid_from"),
        r.getAs[Long]("n_rows")))
      .toSet

  test("collapse merges consecutive equal values into one interval per run") {
    // key 1: A A B A → three runs (the second A run is NEW — order matters)
    val got = collapse(Seq(
      (1, 10, 0, "A"), (1, 20, 0, "A"), (1, 30, 0, "B"), (1, 40, 0, "A"),
      (2, 5, 0, "X")))
    assert(got == Set(
      (1, 1L, "A", 10, 2L), (1, 2L, "B", 30, 1L), (1, 3L, "A", 40, 1L),
      (2, 1L, "X", 5, 1L)))
  }

  test("collapse treats consecutive NULLs as one run (IS DISTINCT FROM)") {
    val rows = Seq(
      (1, 10, 0, "A"), (1, 20, 0, null), (1, 30, 0, null), (1, 40, 0, "A"))
    val got = collapse(rows.asInstanceOf[Seq[(Int, Int, Int, String)]])
    assert(got == Set(
      (1, 1L, "A", 10, 1L), (1, 2L, null, 20, 2L), (1, 3L, "A", 40, 1L)))
  }

  test("collapse uses the tiebreak for a total order within equal ord") {
    // same ord: tie column decides B-then-A vs A-then-B
    val got = collapse(Seq((1, 10, 2, "A"), (1, 10, 1, "B")))
    assert(got == Set((1, 1L, "B", 10, 1L), (1, 2L, "A", 10, 1L)))
  }

  test("q54 intervals chain: valid_to = next valid_from, open end sentinel") {
    val rows = Scd2.q54PriorityScd2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val far = Date.valueOf("9999-12-31")
    rows.groupBy(_.getAs[Long]("custkey")).foreach { case (ck, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq ==
        (1L to sorted.length).toSeq, s"custkey $ck versions not contiguous")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Date]("valid_to") == b.getAs[Date]("valid_from"),
            s"custkey $ck interval chain broken")
        case _ =>
      }
      assert(sorted.last.getAs[Date]("valid_to") == far)
    }
  }

  test("q55 finds the planted excerpts as containment≈1 pairs") {
    val rows = CurationQueries.q55ContainmentDup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      val c = r.getAs[Double]("containment")
      assert(c >= 0.9 && c <= 1.0 + 1e-12)
    }
    // planted pairs: excerpt id = doc_id + 200000, always containment 1.0
    // (prefix-excerpt shingles ⊆ the doc's shingles). Prefix filtering's
    // recall is COMPLETE, so EVERY planted pair must surface — the
    // df-capped candidate scheme this replaced could legally drop some.
    val planted = rows.filter(r =>
      r.getAs[Long]("b_id") - r.getAs[Long]("a_id") == 200000L)
      .map(_.getAs[Long]("a_id")).toSet
    val expected = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 10 === 0).select("doc_id")
      .as[Long].collect().toSet
    assert(planted == expected,
      s"missing planted pairs for docs ${expected -- planted}")
    rows.filter(r => r.getAs[Long]("b_id") - r.getAs[Long]("a_id") == 200000L)
      .foreach(r =>
        assert(math.abs(r.getAs[Double]("containment") - 1.0) < 1e-12))
  }

  test("q56 respects per-language quotas with contiguous dense ranks") {
    val rows = CurationQueries.q56QuotaCuration(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val quota = if (lang == "en") 40 else 25
      assert(rs.length <= quota, s"$lang over quota: ${rs.length}")
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq ==
        (1 to sorted.length).toSeq, s"$lang ranks not contiguous")
      // scores non-increasing down the ranking
      sorted.map(_.getAs[Double]("score")).sliding(2).foreach {
        case Array(hi, lo) => assert(hi >= lo, s"$lang scores out of order")
        case _ =>
      }
    }
  }

  test("q57 is a deterministic permutation with dense per-shard positions") {
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").as[Long].collect().toSet
    val rows = CurationQueries.q57GlobalShuffle(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == all) // permutation
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (sh, rs) =>
      assert(sh >= 0 && sh < 16)
      assert(rs.map(_.getAs[Int]("pos")).sorted.toSeq ==
        (1 to rs.length).toSeq, s"shard $sh positions not dense")
      // within-shard order follows the salted key (doc_id tiebreak)
      val byPos = rs.sortBy(_.getAs[Int]("pos"))
        .map(r => (r.getAs[Long]("sort_key"), r.getAs[Long]("doc_id")))
      assert(byPos.sameElements(byPos.sortBy(identity)), s"shard $sh order")
    }
    val again = CurationQueries.q57GlobalShuffle(spark, sfDir).collect()
    assert(rows.sameElements(again))
  }
}
