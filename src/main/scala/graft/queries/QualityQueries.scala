package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate functional-dependency discovery — the schema-level data
  * profiler that complements the value-level q82/q58 profiles: does
  * column A determine column B, and if not, how badly is the dependency
  * violated? The metric is the standard g3 error (Kivinen-Mannila): the
  * minimum fraction of rows that must be deleted for the FD to hold
  * exactly, i.e. 1 − (Σ per-lhs-group max rhs-value count) / N. A data
  * catalog runs exactly this sweep to propose keys, spot denormalization
  * drift, and flag dirty dimension columns.
  */
object QualityQueries {

  private case class Fd(table: String, lhs: String, rhs: String)

  /** The audited candidate set: one true FD (o_orderkey is a key, so
    * o_orderkey → o_orderpriority must come out g3 = 0 — the built-in
    * positive control, and exactly how an FD sweep DISCOVERS keys) and
    * four plausible-but-false dependencies whose violation mass is the
    * informative output. */
  private val candidates = Seq(
    Fd("orders", "o_orderkey", "o_orderpriority"),
    Fd("orders", "o_custkey", "o_orderpriority"),
    Fd("part", "p_brand", "p_type"),
    Fd("part", "p_type", "p_size"),
    Fd("customer", "c_nationkey", "c_mktsegment"))

  // --------------------------------------------------------------- q175
  /** g3 audit of the candidate FDs: per candidate, row count, number of
    * distinct lhs values, the violation count (rows outside their lhs
    * group's plurality rhs value), and the g3 error fraction.
    *
    * Exactness: violations and totals are exact BIGINT sums; g3_error is
    * one double division. The per-lhs plurality uses max(count) only —
    * no tie-break needed, because the VALUE attaining the max never
    * leaves the aggregate, only its count does.
    *
    * Scale shape: per candidate, two map-combinable hash aggs —
    * (lhs, rhs) counts, then per-lhs max/sum — and a final single-row
    * reduce; the widest intermediate is the (lhs, rhs) census, bounded
    * by the attribute domain product, not the row count. The four
    * branches scan three tables once each and union 4 summary rows.
    * Everything pipelines; nothing is quadratic in rows at any scale. */
  def q175FdAudit(spark: SparkSession, dir: String): DataFrame = {
    val parts = candidates.map { fd =>
      Kpis.table(spark, dir, fd.table)
        .select(col(fd.lhs).cast("string").as("l"),
          col(fd.rhs).cast("string").as("r"))
        .groupBy(col("l"), col("r")).agg(count(lit(1)).as("c"))
        .groupBy(col("l"))
        .agg(max(col("c")).as("keep"), sum(col("c")).as("n_l"))
        .agg(sum(col("n_l")).as("n_rows"),
          count(lit(1)).as("n_lhs_values"),
          sum(col("keep")).as("kept"))
        .select(
          lit(fd.table).as("table_name"),
          lit(fd.lhs).as("lhs"), lit(fd.rhs).as("rhs"),
          col("n_rows"), col("n_lhs_values"),
          (col("n_rows") - col("kept")).as("g3_violations"),
          ((col("n_rows") - col("kept")).cast("double") /
            col("n_rows").cast("double")).as("g3_error"))
    }
    parts.reduce(_ unionAll _).orderBy("table_name", "lhs")
  }

  val q175Sql: String = {
    def one(fd: Fd): String =
      s"""SELECT '${fd.table}' AS table_name, '${fd.lhs}' AS lhs,
        |  '${fd.rhs}' AS rhs,
        |  CAST(SUM(n_l) AS BIGINT) AS n_rows,
        |  COUNT(*) AS n_lhs_values,
        |  CAST(SUM(n_l) - SUM(keep) AS BIGINT) AS g3_violations,
        |  CAST(SUM(n_l) - SUM(keep) AS DOUBLE) / CAST(SUM(n_l) AS DOUBLE)
        |    AS g3_error
        |FROM (
        |  SELECT l, MAX(c) AS keep, SUM(c) AS n_l
        |  FROM (
        |    SELECT CAST(${fd.lhs} AS VARCHAR) AS l,
        |      CAST(${fd.rhs} AS VARCHAR) AS r, COUNT(*) AS c
        |    FROM ${fd.table} GROUP BY 1, 2)
        |  GROUP BY l)""".stripMargin
    candidates.map(one).mkString("", "\nUNION ALL\n", "\nORDER BY table_name, lhs")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q175_fd_audit" -> (q175FdAudit _))

  def oracles: Map[String, String] = Map(
    "q175_fd_audit" -> q175Sql)
}
