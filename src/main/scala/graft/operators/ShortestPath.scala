package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded single-source shortest path over a WEIGHTED undirected edge
  * list — Bellman-Ford restricted to `maxHops` relaxation rounds, the
  * weighted companion of [[BfsDistance]] (which this generalizes: unit
  * weights give exactly its hop distances).
  *
  * Weights are BIGINTs by contract. Integer path costs are what make the
  * operator oracle-certifiable: sums of longs are associative, so a path's
  * cost is the same number no matter which engine (or iteration order)
  * folds it, and `min` over exact integers is deterministic — a float
  * weight would make "equal-cost" ties engine-dependent. Callers with
  * ratio weights pre-scale to integers (q173 uses 10⁶ div support).
  *
  * Algorithm: dist starts as the seeds at cost 0; each round relaxes ONLY
  * the frontier of nodes whose cost improved last round (a node whose
  * cost did not change cannot improve a neighbor it already relaxed —
  * the standard queue-based Bellman-Ford pruning), merges candidates into
  * dist with a min-agg, and the improved rows form the next frontier.
  * After k rounds dist(v) is exactly min cost over paths of ≤ k edges —
  * the invariant the recursive-CTE oracle replays declaratively.
  *
  * Scale shape (100 TB): the symmetrized edge list is hash-partitioned by
  * `src` once and checkpointed — each round shuffles only the FRONTIER to
  * the edges' fixed layout (the BfsDistance discipline); the min-merge
  * agg is map-combinable; every round eagerly localCheckpoints so plan
  * depth stays O(1) per round and `isEmpty` reads materialized state.
  */
object ShortestPath {

  /** Min path cost from `seeds` (one-column node frame) to every node
    * reachable within `maxHops` edges of `edges(srcCol, dstCol, wCol)`,
    * undirected. Returns (node, cost), cost = exact BIGINT sum of edge
    * weights along the cheapest ≤maxHops-edge path. */
  def costs(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
            seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val spark = edges.sparkSession
    val par = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val und = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst"),
        col(wCol).cast("long").as("w")))
      .repartition(par, col("src"))
      .localCheckpoint()
    var dist = seeds.toDF("node")
      .distinct().withColumn("cost", lit(0L)).localCheckpoint()
    var frontier = dist
    var k = 1
    var done = maxHops == 0 || frontier.isEmpty
    while (!done) {
      val cand = frontier.join(und, col("node") === col("src"))
        .select(col("dst").as("node"), (col("cost") + col("w")).as("cost"))
        .groupBy(col("node")).agg(min(col("cost")).as("cost"))
      val merged = dist.union(cand)
        .groupBy(col("node")).agg(min(col("cost")).as("cost"))
        .localCheckpoint()
      frontier = merged
        .join(dist.select(col("node").as("onode"), col("cost").as("old")),
          col("node") === col("onode"), "left")
        .filter(col("old").isNull || col("cost") < col("old"))
        .select(col("node"), col("cost"))
        .localCheckpoint()
      dist = merged
      k += 1
      done = k > maxHops || frontier.isEmpty
    }
    dist
  }
}
