package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Generator

/** Synthetic generator (SURVEY §2.1 S14): field domains, determinism,
  * distributed shape. */
class GeneratorSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("field domains match the reference generator contract") {
    val df = Generator.salesData(spark, 500L).cache()
    try {
      assert(df.count() == 500)
      assert(df.filter(!col("sale_date").between(
        "2024-01-01 00:00:00", "2024-12-31 23:59:59")).count() == 0)
      assert(df.filter(!col("quantity").between(1, 20)).count() == 0)
      // amount = U(10,500) * qty → within [10*1, 500*20]
      assert(df.filter(!col("amount").between(10.0, 10000.0)).count() == 0)
      val cust = df.select(regexp_extract(col("customer_id"), "^CUST-(\\d+)$", 1)
        .cast("int").as("n"))
      assert(cust.filter(col("n").isNull || !col("n").between(1000, 9999)).count() == 0)
      val prod = df.select(regexp_extract(col("product_id"), "^PROD-(\\d+)$", 1)
        .cast("int").as("n"))
      assert(prod.filter(col("n").isNull || !col("n").between(100, 999)).count() == 0)
      // surrogate keys unique
      assert(df.select("sale_id").distinct().count() == 500)
    } finally df.unpersist()
  }

  test("seeded output is deterministic; uuid mode yields distinct ids") {
    val a = Generator.salesData(spark, 100L).orderBy("sale_id").collect()
    val b = Generator.salesData(spark, 100L).orderBy("sale_id").collect()
    assert(a.sameElements(b))
    val u = Generator.salesData(spark, 100L, withUuid = true)
      .select("sale_id").distinct().count()
    assert(u == 100)
  }

  test("generated data round-trips the clean+dedup ingest contract") {
    val out = Generator.q30SyntheticSales(spark, "unused").collect()
    assert(out.map(_.getAs[Long]("n_sales")).sum == 1000)
  }

  test("q30 output is pinned byte-for-byte (drift tripwire)") {
    // q30 is oracle-checked since the hash-derived generator rewrite; the
    // byte pin stays as a cheap in-suite tripwire for semantic drift in
    // the generator, the clean/dedup path, or the aggregation.
    val rows = Generator.q30SyntheticSales(spark, "unused").collect()
    val canon = rows.map(_.toString).mkString("\n")
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(hash == "f67a0dcbca97bc8370e82a1a840e2962",
      s"q30 output drifted; hash=$hash\n$canon")
  }
}
