package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Kpis

/** Keyed snapshot diff — the "what changed between two table versions"
  * primitive behind data-lake audits, CDC backfills and regression
  * checks on rebuilt tables: classify every key as added / removed /
  * changed / unchanged between an old and a new snapshot, comparing a
  * declared payload column list.
  *
  * Scale shape: ONE full-outer equi-join on the key (each side shuffles
  * once) and a pure-map classification — no windows, no driver
  * collection; the summary rollup is a map-side-combinable count. The
  * per-column comparison uses null-safe equality (`<=>`), so NULL→value
  * and value→NULL transitions classify as changed, not unchanged.
  */
object SnapshotDiff {

  /** Per-key classification frame: (key, change) for every key present
    * in either snapshot; `change ∈ {added, removed, changed, unchanged}`. */
  def diff(oldDf: DataFrame, newDf: DataFrame, key: String,
           payload: Seq[String]): DataFrame = {
    val o = oldDf.select((key +: payload).map(c => col(c).as(s"o_$c")): _*)
    val n = newDf.select((key +: payload).map(c => col(c).as(s"n_$c")): _*)
    val same = payload.map(c => col(s"o_$c") <=> col(s"n_$c"))
      .reduce(_ && _)
    o.join(n, col(s"o_$key") === col(s"n_$key"), "full_outer")
      .select(
        coalesce(col(s"o_$key"), col(s"n_$key")).as("key"),
        when(col(s"o_$key").isNull, lit("added"))
          .when(col(s"n_$key").isNull, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")).as("change"))
  }

  // ---------------------------------------------------------------- q90
  /** Diff the orders table against a deterministically perturbed next
    * version (every 4th order re-priced, every 9th dropped, clones of
    * every 11th appended with ids offset +1e12 — far above any real
    * orderkey at any scale factor — the q61 synthetic-changelog
    * convention), summarized per change class. */
  def q90SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Kpis.table(spark, dir, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
        col("o_orderstatus").as("status"))
    val newSnap = o.filter(col("k") % 9 =!= 0)
      .select(col("k"),
        when(col("k") % 4 === 0, col("price") + lit(5.0))
          .otherwise(col("price")).as("price"),
        col("status"))
      .unionAll(o.filter(col("k") % 11 === 0)
        .select((col("k") + 1000000000000L).as("k"), col("price"),
          col("status")))
    diff(o, newSnap, "k", Seq("price", "status"))
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy("change")
  }

  val q90Sql: String =
    """WITH o AS (
      |  SELECT o_orderkey AS k, o_totalprice AS price,
      |    o_orderstatus AS status
      |  FROM orders),
      |n AS (
      |  SELECT k,
      |    CASE WHEN k % 4 = 0 THEN price + 5.0 ELSE price END AS price,
      |    status
      |  FROM o WHERE k % 9 <> 0
      |  UNION ALL
      |  SELECT k + 1000000000000, price, status FROM o WHERE k % 11 = 0),
      |d AS (
      |  SELECT
      |    CASE WHEN o.k IS NULL THEN 'added'
      |         WHEN n.k IS NULL THEN 'removed'
      |         WHEN o.price IS NOT DISTINCT FROM n.price
      |          AND o.status IS NOT DISTINCT FROM n.status THEN 'unchanged'
      |         ELSE 'changed' END AS change
      |  FROM o FULL OUTER JOIN n ON o.k = n.k)
      |SELECT change, COUNT(*) AS n_keys
      |FROM d GROUP BY change ORDER BY change""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_snapshot_diff" -> (q90SnapshotDiff _))

  def oracles: Map[String, String] = Map(
    "q90_snapshot_diff" -> q90Sql)
}
