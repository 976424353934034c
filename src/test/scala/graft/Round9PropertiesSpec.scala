package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions.fingerprint
import graft.operators.{IncrementalDedup, SemanticCells}
import graft.queries.Round9Queries

/** Property-based invariants for the round-9 operators, in
  * OperatorPropertiesSpec's fixed-seed explicit-sampler style. Ground
  * truths are sequential Scala models sharing no machinery with the code
  * under test. */
class Round9PropertiesSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))

  test("incremental dedup equals a sequential set-based model") {
    // store = texts of batch 1; survivors of batch 2 = min-id per novel
    // normalized text. Texts draw from a small pool to force collisions
    // within and across batches.
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
    val text = Gen.listOfN(3, word).map(_.mkString(" "))
    val row = for { id <- Gen.choose(1L, 60L); t <- text } yield (id, t)
    val batchGen = Gen.listOfN(25, row)
      .map(_.groupBy(_._1).map(_._2.head).toSeq) // unique ids within a batch
    def norm(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ")
    (1L to 15L).foreach { seed =>
      val b1 = sample(batchGen, seed)
      val b2 = sample(batchGen, seed + 1000).map { case (i, t) => (i + 100L, t) }
      val storeTexts = b1.map(x => norm(x._2)).toSet
      val expected = b2.filterNot(x => storeTexts(norm(x._2)))
        .groupBy(x => norm(x._2)).values.map(_.minBy(_._1)._1).toSet
      val store = b1.toDF("doc_id", "text")
        .select(fingerprint(col("text")).as("fp")).distinct()
      val batch = b2.toDF("doc_id", "text")
        .select(col("doc_id"), lit("xx").as("lang"),
          fingerprint(col("text")).as("fp"))
      val got = IncrementalDedup.dedupAgainstStore(batch, store)
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(got == expected, s"seed $seed: $got vs $expected")
    }
  }

  test("multi-probe cell pairs are a superset of single-probe pairs") {
    val vec = Gen.listOfN(4, Gen.choose(-5.0, 5.0))
      .map(_.map(_.toFloat))
      .suchThat(v => v.exists(_ != 0f))
    val corpus = Gen.listOfN(30, vec)
    (1L to 5L).foreach { seed =>
      val vs = sample(corpus, seed).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
      val e = vs.toDF("vec_id", "embedding")
        .withColumn("n2",
          graft.functions.VectorFunctions.norm2(col("embedding")))
      def pairs(probes: Int) =
        SemanticCells.cellPairs(e, k = 4, iters = 1, t = 0.3, probes)
          .select("a_id", "b_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val p1 = pairs(1)
      val p2 = pairs(2)
      assert(p1.subsetOf(p2),
        s"seed $seed: single-probe pairs missing from multi-probe: ${p1.diff(p2)}")
    }
  }

  test("bucket digest is partition-layout independent and change-sensitive") {
    val row = for {
      k <- Gen.choose(1L, 500L)
      v <- Gen.choose(0L, 1000000L)
    } yield (k, v)
    (1L to 10L).foreach { seed =>
      val rows = sample(Gen.listOfN(80, row), seed)
        .groupBy(_._1).map(_._2.head).toSeq // unique keys
      def digestOf(data: Seq[(Long, Long)], parts: Int) =
        Round9Queries.bucketDigest(
            data.toDF("k", "v").repartition(parts),
            col("k"), concat_ws("|", col("k"), col("v")), 8, "d")
          .collect()
          .map(r => (r.getAs[Long]("bucket"),
            (r.getAs[Long]("d_cnt"), r.getAs[Long]("d_digest")))).toMap
      // XOR commutativity: any partitioning computes identical digests
      val d3 = digestOf(rows, 3)
      val d7 = digestOf(rows, 7)
      assert(d3 == d7, s"seed $seed: digest depends on partitioning")
      // change sensitivity: perturb one row -> exactly its bucket differs
      val (pk, pv) = rows.head
      val perturbed = (pk, pv + 1L) +: rows.tail
      val dp = digestOf(perturbed, 3)
      val changed = d3.keySet.union(dp.keySet)
        .filter(b => d3.get(b) != dp.get(b))
      assert(changed == Set(pk % 8),
        s"seed $seed: expected only bucket ${pk % 8} to flip, got $changed")
    }
  }

  test("triangle summary equals brute force on random graphs") {
    // random canonical edge lists over 24 nodes; the sequential model
    // counts triangles by common-neighbor intersection per edge
    val edgeGen = Gen.listOfN(70, for {
      x <- Gen.choose(1L, 24L); y <- Gen.choose(1L, 24L) if x != y
    } yield (math.min(x, y), math.max(x, y))).map(_.distinct)
    (1L to 10L).foreach { seed =>
      val edges = sample(edgeGen, seed)
      val adj = edges.flatMap { case (x, y) => Seq(x -> y, y -> x) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val tri = edges.map { case (x, y) => (adj(x) & adj(y)).size }.sum / 3
      val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
      val row = graft.operators.TriangleCount
        .summary(edges.toDF("a", "b")).collect().head
      assert(row.getAs[Long]("n_nodes") == adj.size.toLong, s"seed $seed")
      assert(row.getAs[Long]("n_edges") == edges.length.toLong, s"seed $seed")
      assert(row.getAs[Long]("n_wedges") == wedges, s"seed $seed")
      assert(row.getAs[Long]("n_triangles") == tri.toLong,
        s"seed $seed: oriented closure diverges from brute force")
    }
  }
}
