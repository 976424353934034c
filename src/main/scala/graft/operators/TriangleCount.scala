package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-oriented distributed triangle counting — the reusable core
  * under [[graft.queries.GraphQueries]] q111, usable over any undirected
  * edge list (co-purchase, similarity graphs from the dedup family,
  * entity-resolution match graphs).
  *
  * Orient every edge from its lower-(degree, id) endpoint to the higher
  * one; wedges are a self-equi-join of the oriented edges on their
  * source; each wedge closes (or not) via an equi-join back on the
  * oriented closing edge. Orientation caps every out-degree at O(√m),
  * so wedge enumeration is O(m^1.5) worst-case instead of Σdeg² — on a
  * skewed graph (one hub of degree h contributes h²/2 unoriented wedges
  * but only its few up-rank neighbors oriented) this is the difference
  * between feasible and not at 100 TB. Everything is equi-joins and hash
  * aggregates; nothing ever materializes a neighborhood in one row.
  */
object TriangleCount {

  /** Summary row (n_nodes, n_edges, n_wedges, n_triangles, global_cc)
    * for the undirected graph given as a DISTINCT canonical edge list
    * (columns `a` < `b`, one row per edge). The oriented table is
    * eagerly localCheckpoint'd — it feeds three join branches, and the
    * checkpoint keeps upstream edge construction from re-running per
    * branch. n_wedges = Σ C(deg,2) stays in integer arithmetic
    * throughout (`div`), exact past 2^53 where a double sum would drift.
    */
  def summary(edges: DataFrame, a: String = "a", b: String = "b"): DataFrame = {
    val e = edges.select(col(a).as("ea"), col(b).as("eb")).localCheckpoint()
    val und = e.select(col("ea").as("u"))
      .unionAll(e.select(col("eb").as("u")))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("u").as("ea"), col("d").as("da")), "ea")
      .join(deg.select(col("u").as("eb"), col("d").as("db")), "eb")
    val aFirst = (col("da") < col("db")) ||
      (col("da") === col("db") && col("ea") < col("eb"))
    val oriented = withDeg.select(
        when(aFirst, col("ea")).otherwise(col("eb")).as("src"),
        when(aFirst, col("eb")).otherwise(col("ea")).as("dst"),
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
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val nWedges = deg.agg(sum(col("d") * (col("d") - 1)).as("s2"))
      .select(expr("s2 div 2").cast("long").as("n_wedges"))
    tri.crossJoin(broadcast(nNodes)).crossJoin(broadcast(nEdges))
      .crossJoin(broadcast(nWedges))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        (lit(3.0) * col("n_triangles").cast("double") /
          col("n_wedges").cast("double")).as("global_cc"))
  }

  /** Per-node triangle incidence: (u, d, t) — degree and the number of
    * triangles containing u — for every node of the graph. Same
    * degree-oriented enumeration as [[summary]], but the oriented rank
    * join is kept as a LIST (each triangle appears exactly once as
    * (src, v, w)) and exploded to its three corners. Feeds local
    * clustering coefficients: cc(u) = 2t / (d·(d−1)). */
  def perNodeCc(edges: DataFrame, a: String = "a", b: String = "b"): DataFrame = {
    val e = edges.select(col(a).as("ea"), col(b).as("eb")).localCheckpoint()
    val und = e.select(col("ea").as("u"))
      .unionAll(e.select(col("eb").as("u")))
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("u").as("ea"), col("d").as("da")), "ea")
      .join(deg.select(col("u").as("eb"), col("d").as("db")), "eb")
    val aFirst = (col("da") < col("db")) ||
      (col("da") === col("db") && col("ea") < col("eb"))
    val oriented = withDeg.select(
        when(aFirst, col("ea")).otherwise(col("eb")).as("src"),
        when(aFirst, col("eb")).otherwise(col("ea")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("dst_deg"))
      .localCheckpoint()
    val e1 = oriented.select(col("src"), col("dst").as("v"),
      col("dst_deg").as("dv"))
    val e2 = oriented.select(col("src"), col("dst").as("w"),
      col("dst_deg").as("dw"))
    val e3 = oriented.select(col("src").as("v"), col("dst").as("w"))
    val triangles = e1.join(e2, "src")
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .join(e3, Seq("v", "w"), "left_semi")
      .select(col("src"), col("v"), col("w"))
    val incid = triangles
      .select(explode(array(col("src"), col("v"), col("w"))).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("t0"))
    deg.join(incid, Seq("u"), "left")
      .select(col("u"), col("d"), coalesce(col("t0"), lit(0L)).as("t"))
  }
}
