package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded multi-source BFS: exact hop distances from a seed set over an
  * undirected edge list, out to `maxHops`. The iterative-frontier twin of
  * [[PageRank]] — same per-round join+agg discipline, but the state is a
  * monotone visited set instead of a dense rank vector.
  *
  * Algorithm: classic frontier expansion. `visited` starts as the seeds at
  * distance 0; each round joins the CURRENT FRONTIER (not the whole visited
  * set) against the adjacency list, anti-joins out already-visited nodes,
  * and what remains is exactly the set at distance k — BFS's first-visit =
  * shortest-distance invariant, which is what makes the output equal to the
  * oracle's MIN(dist) over all ≤k-hop walks without ever enumerating walks.
  *
  * Scale shape (100 TB): the adjacency list is symmetrized once, hash-
  * partitioned by `src`, and checkpointed — every round's join shuffles
  * ONLY the frontier (≤ |V| rows, usually far less) to the edges' fixed
  * layout, never the edge table itself. The anti-join is frontier-vs-
  * visited — both node-sized, not edge-sized. Each round eagerly
  * localCheckpoints the new layer, so plan depth stays O(1) per round
  * (the k-means/PageRank lineage-truncation convention) and the loop's
  * `isEmpty` early-exit reads the materialized layer, costing no recompute.
  * Frontier dedup (`distinct`) runs BEFORE the anti-join so a node reached
  * through many same-length paths ships once, not once per path.
  */
object BfsDistance {

  /** Hop distances from `seeds` (a one-column frame of node ids) over
    * `edges(srcCol, dstCol)` treated as undirected. Returns (node, dist)
    * with dist ∈ [0, maxHops], one row per reached node. */
  def distances(edges: DataFrame, srcCol: String, dstCol: String,
                seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    val par = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .repartition(par, col("src"))
      .localCheckpoint()
    var visited = seeds.toDF("node").distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = visited.select("node")
    var k = 1
    var done = maxHops == 0 || frontier.isEmpty
    while (!done) {
      val layer = frontier.join(und, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node").withColumnRenamed("node", "vnode"),
          col("node") === col("vnode"), "left_anti")
        .withColumn("dist", lit(k.toLong))
        .localCheckpoint()
      visited = visited.union(layer).localCheckpoint()
      frontier = layer.select("node")
      k += 1
      done = k > maxHops || layer.isEmpty
    }
    visited
  }
}
