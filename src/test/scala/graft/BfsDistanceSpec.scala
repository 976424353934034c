package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BfsDistance

/** BFS frontier-expansion operator (q123's engine): pinned shapes plus a
  * random-graph equivalence check against an in-memory reference BFS.
  */
class BfsDistanceSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  maxHops: Int): Map[Long, Long] =
    BfsDistance.distances(edges.toDF("s", "d"), "s", "d",
        seeds.toDF("node"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference BFS over the undirected adjacency map. */
  private def refBfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     maxHops: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupMap(_._1)(_._2)
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    for (k <- 1 to maxHops) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist ++= frontier.map(_ -> k.toLong)
    }
    dist
  }

  test("path graph: distances are hop indices, horizon cuts the tail") {
    val path = (1L to 9L).sliding(2).map(w => (w(0), w(1))).toSeq
    assert(run(path, Seq(1L), 4) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("multi-source: a node takes the distance of its NEAREST seed") {
    val path = (1L to 9L).sliding(2).map(w => (w(0), w(1))).toSeq
    val d = run(path, Seq(1L, 9L), 4)
    assert(d(5L) == 4L && d(8L) == 1L && d(2L) == 1L)
  }

  test("disconnected component never appears; cycle does not loop") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L))
    val d = run(g, Seq(1L), 4)
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("maxHops=0 returns exactly the deduplicated seed layer") {
    assert(run(Seq((1L, 2L)), Seq(1L, 1L), 0) == Map(1L -> 0L))
  }

  test("random graphs match the reference BFS exactly") {
    val rnd = new Random(4242)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = Seq.fill(80)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val seeds = Seq(rnd.nextInt(n).toLong)
      val hops = 1 + rnd.nextInt(4)
      assert(run(edges, seeds, hops) == refBfs(edges, seeds, hops),
        s"trial $trial: mismatch (seeds=$seeds hops=$hops)")
    }
  }
}
