package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over the co-purchase graph (companion to
  * [[BasketQueries]] q92 and the PageRank/connected-components operators):
  * triangle counting and the global clustering coefficient — the standard
  * graph-density telemetry for recommendation and community workloads.
  */
object GraphQueries {

  // --------------------------------------------------------------- q111
  /** Triangle count + global clustering coefficient of the co-purchase
    * graph (nodes = parts; an edge joins two parts co-purchased in ≥ 2
    * distinct orders — the support threshold that keeps incidental
    * one-basket pairings out and the graph sparse).
    *
    * Counting is [[graft.operators.TriangleCount.summary]] — the
    * degree-oriented wedge-closure operator (see its scaladoc for the
    * O(m^1.5) argument); this query owns only the edge construction:
    * order-local pair explosion (q92's shape) → support filter →
    * localCheckpoint (reused by the operator's degree and count
    * branches without re-running the basket explosion).
    *
    * Output is one summary row; the clustering coefficient divides two
    * exact integer counts in one double op — bit-identical cross-engine.
    */
  def q111Triangles(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Kpis.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(array_distinct(collect_list(col("l_partkey"))))
        .as("parts"))
    val pairs = baskets.select(explode(flatten(
        transform(col("parts"), (a, i) =>
          transform(slice(col("parts"), i + lit(2),
              greatest(size(col("parts")) - i - 1, lit(0))),
            b => struct(a.as("pa"), b.as("pb"))))))
        .as("pr"))
      .select(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
    val edges = pairs.groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .select("pa", "pb")
      .localCheckpoint()
    graft.operators.TriangleCount.summary(edges, "pa", "pb")
  }

  val q111Sql: String =
    """WITH baskets AS MATERIALIZED (
      |  SELECT l_orderkey,
      |    list_sort(list_distinct(list(l_partkey))) AS parts
      |  FROM lineitem GROUP BY 1),
      |pr AS MATERIALIZED (
      |  SELECT t1.p AS pa, t2.p AS pb
      |  FROM (SELECT l_orderkey AS ok, unnest(parts) AS p FROM baskets) t1
      |  JOIN (SELECT l_orderkey AS ok, unnest(parts) AS p FROM baskets) t2
      |    USING (ok)
      |  WHERE t1.p < t2.p),
      |edges AS MATERIALIZED (
      |  SELECT pa, pb FROM pr GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |und AS (SELECT pa AS u FROM edges UNION ALL SELECT pb FROM edges),
      |deg AS MATERIALIZED (SELECT u, COUNT(*) AS d FROM und GROUP BY 1),
      |o AS MATERIALIZED (
      |  SELECT
      |    CASE WHEN (da.d, pa) < (db.d, pb) THEN pa ELSE pb END AS src,
      |    CASE WHEN (da.d, pa) < (db.d, pb) THEN pb ELSE pa END AS dst,
      |    CASE WHEN (da.d, pa) < (db.d, pb) THEN db.d ELSE da.d END
      |      AS dst_deg
      |  FROM edges
      |  JOIN deg da ON da.u = pa
      |  JOIN deg db ON db.u = pb),
      |tri AS (
      |  SELECT COUNT(*) AS n_triangles
      |  FROM o e1
      |  JOIN o e2 ON e1.src = e2.src
      |    AND ((e1.dst_deg, e1.dst) < (e2.dst_deg, e2.dst))
      |  WHERE EXISTS (SELECT 1 FROM o e3
      |                WHERE e3.src = e1.dst AND e3.dst = e2.dst))
      |SELECT
      |  (SELECT COUNT(*) FROM deg) AS n_nodes,
      |  (SELECT COUNT(*) FROM edges) AS n_edges,
      |  (SELECT CAST(SUM((d * (d - 1)) // 2) AS BIGINT) FROM deg)
      |    AS n_wedges,
      |  n_triangles,
      |  3.0 * CAST(n_triangles AS DOUBLE)
      |    / CAST((SELECT CAST(SUM((d * (d - 1)) // 2) AS BIGINT) FROM deg)
      |           AS DOUBLE) AS global_cc
      |FROM tri""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q111_triangles" -> (q111Triangles _))

  def oracles: Map[String, String] = Map(
    "q111_triangles" -> q111Sql)
}
