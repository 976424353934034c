package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DocQueries

/** q411's ladder contract: duplicate mass is monotone non-decreasing as
  * normalization gets more aggressive (coarser fingerprints can only
  * merge), the raw level finds zero dups (the fixture corpus has no
  * byte-identical pairs and every planted copy is mangled), and each
  * step's marginal equals exactly its planted class size. */
class NormalizationLadderSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = DocQueries.q411NormalizationLadder(spark, sfDir)
    .collect().sortBy(_.getAs[Long]("level_id"))

  private lazy val planted: Map[Int, Long] = {
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    Map(5 -> ids.count(_ % 5 == 0).toLong,
      7 -> ids.count(_ % 7 == 0).toLong,
      11 -> ids.count(_ % 11 == 0).toLong)
  }

  test("raw finds nothing; dup mass monotone in normalization strength") {
    assert(rows.head.getAs[Long]("dup_docs") == 0L, rows.head.toString)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("dup_docs") <= b.getAs[Long]("dup_docs"),
          s"coarser fingerprints can only merge more: $a vs $b")
        assert(a.getAs[Long]("n_distinct") >= b.getAs[Long]("n_distinct"))
      case _ =>
    }
  }

  test("each ladder step's marginal is exactly its planted class") {
    val byLevel = rows.map(r => r.getAs[String]("level") ->
      r.getAs[Long]("marginal_dups")).toMap
    assert(byLevel("casefold") == planted(5),
      s"casefold must expose the ${planted(5)} uppercased copies: $byLevel")
    assert(byLevel("whitespace") == planted(7),
      s"whitespace collapse must expose the ${planted(7)} space-mangled " +
        s"copies: $byLevel")
    assert(byLevel("punct_strip") == planted(11),
      s"punctuation strip must expose the ${planted(11)} decorated " +
        s"copies: $byLevel")
  }
}
