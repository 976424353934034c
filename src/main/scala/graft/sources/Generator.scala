package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic sales generator (reference `dags/src/generator.py:7-43`,
  * SURVEY §2.1 S14): n rows with a surrogate key, a uniform datetime in
  * 2024, `CUST-[1000,9999]`, `PROD-[100,999]`, quantity 1–20, and
  * `amount = U(10,500) × quantity` rounded to 2 dp.
  *
  * Spark-first shape: `spark.range(n)` is an embarrassingly-parallel
  * distributed source — no driver-side loop, no collection; at any n the
  * rows materialize directly in executor partitions. Seeded `rand()`
  * columns make the output reproducible run-to-run (the reference uses
  * unseeded `random`; determinism is strictly more useful for tests).
  * `withUuid = true` swaps the surrogate key for real `uuid()` strings
  * (matching `generator.py:17`) at the cost of determinism.
  */
object Generator {

  def salesData(spark: SparkSession, n: Long = 1200L,
                seed: Long = 42L, withUuid: Boolean = false): DataFrame = {
    val secondsIn2024 = 366L * 24 * 3600 // 2024 is a leap year
    val id =
      if (withUuid) expr("uuid()")
      else concat(lit("S-"), lpad(col("id").cast("string"), 10, "0"))
    // fixed partition count: seeded rand() streams are a function of
    // (partition index, offset), so letting the range default to the
    // session's parallelism would change values across cluster sizes
    spark.range(0, n, 1, numPartitions = 8).select(
      id.as("sale_id"),
      date_format(
        timestamp_seconds(
          lit(java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond) +
            (rand(seed) * secondsIn2024).cast("long")),
        "yyyy-MM-dd HH:mm:ss").as("sale_date"),
      concat(lit("CUST-"),
        (floor(rand(seed + 1) * 9000) + 1000).cast("int")).as("customer_id"),
      concat(lit("PROD-"),
        (floor(rand(seed + 2) * 900) + 100).cast("int")).as("product_id"),
      ((floor(rand(seed + 3) * 20) + 1).cast("int")).as("quantity"),
      round((rand(seed + 4) * 490 + 10) *
        (floor(rand(seed + 3) * 20) + 1), 2).as("amount"))
  }

  /** Rows-only registered entry: generate → run through the real clean +
    * dedup path → aggregate, proving generator output satisfies the ingest
    * contract end-to-end. (`dir` is unused — the generator IS the source.) */
  def q30SyntheticSales(spark: SparkSession, dir: String): DataFrame = {
    val cleaned = graft.ingest.Clean.cleanSales(
      salesData(spark, 1000L).select(
        col("sale_id"), col("sale_date"), col("customer_id"),
        col("product_id"),
        col("quantity").cast("string"), col("amount").cast("string")))
    cleaned
      .groupBy(substring(col("customer_id"), 6, 1).as("cust_prefix"))
      .agg(
        count(lit(1)).as("n_sales"),
        sum(col("quantity")).as("total_qty"),
        sum(col("amount").cast("decimal(18,4)")).cast("double").as("total_amount"))
      .orderBy("cust_prefix")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_synthetic_sales" -> q30SyntheticSales _)
}
