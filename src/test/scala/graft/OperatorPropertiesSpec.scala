package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DupClusters, SequencePack}

/** Property-based invariants for the distributed graph/packing operators,
  * driven by ScalaCheck generators with fixed seeds (deterministic CI)
  * via the same explicit-sampler pattern as CleanPropertiesSpec. Ground
  * truths are independent sequential Scala implementations — no Spark
  * machinery shared with the code under test. */
class OperatorPropertiesSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))

  test("connected components equals union-find min-labels on random graphs") {
    val edgesGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(60, for {
        a <- Gen.choose(0L, 40L); b <- Gen.choose(0L, 40L)
      } yield (a, b))
    (1L to 4L).foreach { seed =>
      val edges = sample(edgesGen, seed)
      // independent ground truth: union-find, min-id representative,
      // membership = nodes with at least one non-self edge
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra max rb) = ra min rb
      }
      val members = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e._1, e._2)).distinct
      val expected = members.groupBy(find).flatMap { case (_, ms) =>
        val cid = ms.min
        ms.map(_ -> cid)
      }.toSet
      val got = DupClusters.connectedComponents(
          edges.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(got == expected, s"seed $seed (${edges.length} edges)")
    }
  }

  test("sequence packing equals a sequential per-stream packer") {
    val capacity = 512
    val shards = 4
    val docsGen: Gen[List[(Long, String, Int)]] =
      Gen.listOfN(80, for {
        id <- Gen.choose(0L, 100000L)
        lang <- Gen.oneOf("en", "de")
        // include zero-token docs (the floor/trunc parity edge) and
        // docs several times the capacity (multi-sequence spans)
        n <- Gen.oneOf(Gen.const(0), Gen.choose(1, 3 * capacity))
      } yield (id, lang, n)).map(_.distinctBy(_._1))
    (1L to 4L).foreach { seed =>
      val docs = sample(docsGen, seed)
      val got = SequencePack.pack(
          docs.toDF("doc_id", "lang", "n_tokens"), capacity, shards)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("first_seq"),
          r.getAs[Long]("n_seqs"), r.getAs[Int]("offset_in_seq")))
        .sortBy(_._1)
      // independent sequential packer per (lang, shard) stream
      val expected = docs
        .groupBy(d => (d._2, math.floorMod(d._1, shards.toLong)))
        .values.flatMap { stream =>
          var cum = 0L
          stream.sortBy(_._1).map { case (id, _, n) =>
            val before = cum
            cum += n
            val firstSeq = before / capacity
            val lastSeq = math.max(cum - 1, before) / capacity
            (id, firstSeq, lastSeq - firstSeq + 1, (before % capacity).toInt)
          }
        }.toSeq.sortBy(_._1)
      assert(got.toSeq == expected, s"seed $seed")
      // structural invariants independent of the model above
      got.foreach { case (id, _, nSeqs, off) =>
        assert(nSeqs >= 1 && off >= 0 && off < capacity, s"doc $id seed $seed")
      }
    }
  }
}
