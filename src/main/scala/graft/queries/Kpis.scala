package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** KPI query half of the rebuild (SURVEY.md §2.5, reference README.md:140-146).
  *
  * The reference delegates all analytics to Postgres/Metabase; here each KPI is
  * a declarative Catalyst plan. Numeric-parity convention (SURVEY §7.4): money
  * aggregates go through exact decimal arithmetic — per-row cast to
  * DECIMAL(18,4) (exact, since prices/discounts are 2-decimal values), an
  * order-independent decimal SUM, and a final correctly-rounded cast to DOUBLE
  * so Spark and the DuckDB oracle emit bit-identical float64.
  *
  * Scale notes (100 TB design): every query below is a pure declarative plan —
  * partial+final hash aggregation, broadcast joins for dimension tables
  * (part/customer/supplier are small relative to the facts), and
  * TakeOrderedAndProject for top-k (no global sort of the fact table).
  */
object Kpis {
  private val Money = DecimalType(18, 4)

  /** Exact order-independent sum of a 2-4dp numeric expression, as double. */
  def moneySum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Exact mean: decimal sum cast to double, divided by the group count. */
  def moneyAvg(c: Column): Column =
    sum(c.cast(Money)).cast(DoubleType) / count(lit(1))

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Revenue expression used throughout (reference README.md:142 "sales totals"). */
  private def revenueExpr: Column =
    col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** Q1: total sales by day (reference README.md:142). */
  def q1DailyRevenue(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("ship_day"))
      .agg(
        moneySum(revenueExpr).as("revenue"),
        moneySum(col("l_quantity")).as("total_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("ship_day")

  val q1Sql: String =
    """SELECT CAST(l_shipdate AS DATE) AS ship_day,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
      |  COUNT(*) AS n_items
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_daily_revenue" -> q1DailyRevenue _
  )

  def oracles: Map[String, String] = Map(
    "q1_daily_revenue" -> q1Sql
  )
}
