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
    * Algorithm is DEGREE-ORIENTED wedge closure (the MapReduce-era
    * standard for distributed triangle counting): orient every edge from
    * its lower-(degree, id) endpoint to the higher one, self-join the
    * oriented edges on their source to enumerate wedges (u→v, u→w with
    * rank(v) < rank(w)), and close each wedge with an equi-join back on
    * the oriented (v, w) edge. Orientation makes every out-degree
    * O(√m) on any graph (arboricity bound), so the wedge join produces
    * O(m^1.5) rows worst-case instead of Σdeg² — the difference between
    * feasible and not on a skewed 100 TB graph. Each triangle
    * {x<y<z by rank} is counted exactly once, at its lowest-rank apex.
    *
    * Both the edge table and the oriented table are eagerly
    * localCheckpoint'd: each is reused by 2–3 downstream joins, and the
    * checkpoint truncates the basket-explosion lineage so the pair
    * generation runs once, not once per reference.
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
    val und = edges.select(col("pa").as("u"))
      .unionAll(edges.select(col("pb").as("u")))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val withDeg = edges
      .join(deg.select(col("u").as("pa"), col("d").as("da")), "pa")
      .join(deg.select(col("u").as("pb"), col("d").as("db")), "pb")
    val aFirst = (col("da") < col("db")) ||
      (col("da") === col("db") && col("pa") < col("pb"))
    val oriented = withDeg.select(
        when(aFirst, col("pa")).otherwise(col("pb")).as("src"),
        when(aFirst, col("pb")).otherwise(col("pa")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("dst_deg"))
      .localCheckpoint()
    val e1 = oriented.select(col("src"), col("dst").as("v"),
      col("dst_deg").as("dv"))
    val e2 = oriented.select(col("src"), col("dst").as("w"),
      col("dst_deg").as("dw"))
    val e3 = oriented.select(col("src").as("v"), col("dst").as("w"))
    val tri = e1.join(e2, "src")
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .join(e3, Seq("v", "w"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = edges.agg(count(lit(1)).as("n_edges"))
    // integer sum then integer halving (`div`): the double route loses
    // exactness past 2^53 total wedges, where the DuckDB twin's HUGEINT
    // sum stays exact
    val nWedges = deg.agg(sum(col("d") * (col("d") - 1)).as("s2"))
      .select(expr("s2 div 2").cast("long").as("n_wedges"))
    tri.crossJoin(broadcast(nNodes)).crossJoin(broadcast(nEdges))
      .crossJoin(broadcast(nWedges))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        (lit(3.0) * col("n_triangles").cast("double") /
          col("n_wedges").cast("double")).as("global_cc"))
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
