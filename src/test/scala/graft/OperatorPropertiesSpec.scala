package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DupClusters, PageRank, SequencePack, SnapshotDiff,
  WeightedSample}

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

  test("mod-2^61-1 permutation equals BigInteger arithmetic exactly") {
    // the cross-engine contract of the MinHash family: the long-only
    // Mersenne-folded permute must equal (a*h + b) mod P computed in
    // arbitrary precision for every input — this is what lets DuckDB
    // HUGEINT replay Spark's signatures bit-for-bit
    import org.apache.spark.sql.graft.MinHashP61
    val P = java.math.BigInteger.valueOf(MinHashP61.P)
    val gen = for {
      a <- Gen.choose(1L, MinHashP61.P - 1)
      b <- Gen.choose(0L, MinHashP61.P - 1)
      h <- Gen.choose(0L, (1L << 60) - 1)
    } yield (a, b, h)
    (1L to 500L).foreach { seed =>
      val (a, b, h) = sample(gen, seed)
      val expected = java.math.BigInteger.valueOf(a)
        .multiply(java.math.BigInteger.valueOf(h))
        .add(java.math.BigInteger.valueOf(b))
        .mod(P).longValueExact()
      assert(MinHashP61.permute(a, b, h) == expected,
        s"permute($a, $b, $h)")
    }
    // boundary inputs: h at the domain edges, a/b at the field edges
    for (a <- Seq(1L, MinHashP61.P - 1); b <- Seq(0L, MinHashP61.P - 1);
         h <- Seq(0L, 1L, (1L << 60) - 1)) {
      val expected = java.math.BigInteger.valueOf(a)
        .multiply(java.math.BigInteger.valueOf(h))
        .add(java.math.BigInteger.valueOf(b))
        .mod(P).longValueExact()
      assert(MinHashP61.permute(a, b, h) == expected, s"permute($a, $b, $h)")
    }
  }

  test("media codecs round-trip random payloads and dimensions") {
    import graft.multimodal.Multimodal.Codec
    val byteGen = Gen.choose(Byte.MinValue, Byte.MaxValue)
    (1L to 20L).foreach { seed =>
      val w = sample(Gen.choose(1, 16), seed)
      val h = sample(Gen.choose(1, 16), seed + 100)
      val frames = sample(Gen.choose(1, 6), seed + 200)
      val rate = sample(Gen.choose(8000, 48000), seed + 300)
      val px = sample(Gen.listOfN(w * h * 3, byteGen), seed + 400).toArray
      val ppm = Codec.decode(Codec.buildPpm(px, w, h))
      assert(ppm.width == w && ppm.height == h && ppm.payload.sameElements(px))
      val samples = sample(Gen.listOfN(w * h, byteGen), seed + 500).toArray
      val wav = Codec.decode(Codec.buildWav(samples, rate))
      assert(wav.sampleRate == rate && wav.payload.sameElements(samples))
      val planes = Seq.tabulate(frames)(f =>
        sample(Gen.listOfN(w * h, byteGen), seed + 600 + f).toArray)
      val y4m = Codec.decode(Codec.buildY4m(planes, w, h))
      assert(y4m.frames == frames && y4m.width == w &&
        y4m.payload.sameElements(planes.flatten))
    }
  }

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

  test("as-of join equals a brute-force per-row scan on random inputs") {
    val leftGen: Gen[List[(Long, Long, Long)]] =
      Gen.listOfN(40, for {
        k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 50L)
      } yield (k, t)).map(_.zipWithIndex.map { case ((k, t), i) =>
        (k, i.toLong, t)
      })
    val rightGen: Gen[List[(Long, Long)]] =
      Gen.listOfN(30, for {
        k <- Gen.choose(0L, 3L); rt <- Gen.choose(0L, 50L)
      } yield (k, rt)).map(_.distinct) // contract: right deduped on (k, rt)
    (1L to 4L).foreach { seed =>
      val left = sample(leftGen, seed)
      val right = sample(rightGen, seed + 100)
      val rightTagged = right.map { case (k, rt) => (k, rt, s"r$k-$rt") }
      val got = graft.operators.AsOfJoin.joinAsOf(
          left.toDF("k", "id", "t"),
          rightTagged.toDF("k", "rt", "tag"),
          "k", "t", "rt", Seq("tag"))
        .collect()
        .map(r => (r.getAs[Long]("id"), Option(r.getAs[String]("tag"))))
        .sortBy(_._1)
      val expected = left.map { case (k, id, t) =>
        val best = rightTagged.filter(r => r._1 == k && r._2 <= t)
        (id, best.sortBy(_._2).lastOption.map(_._3))
      }.sortBy(_._1)
      assert(got.toSeq == expected, s"seed $seed")
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

  test("pageRank conserves mass and matches a sequential power iteration") {
    import org.apache.spark.sql.functions.col
    val graphGen = for {
      n <- Gen.choose(3, 10)
      m <- Gen.choose(n, 3 * n)
      pairs <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1) if a != b
      } yield (s"v$a", s"v$b"))
      if pairs.nonEmpty
    } yield pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    (1L to 8L).foreach { seed =>
      val edges = sample(graphGen, seed)
      val got = PageRank.pageRank(edges.toDF("src", "dst"), iters = 2)
        .collect().map(r => r.getAs[String]("node") ->
          (r.getAs[Double]("r"), r.getAs[Long]("n_out"))).toMap
      // independent sequential power iteration on the same 12-dp grid
      val nodes = edges.map(_._1).distinct.sorted
      val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
      def rnd12(x: Double) = BigDecimal(x)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      var r = nodes.map(_ -> rnd12(1.0 / nodes.size)).toMap
      (1 to 2).foreach { _ =>
        val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
        r = nodes.map { v =>
          val s = in.getOrElse(v, Nil)
            .map(u => BigDecimal(rnd12(r(u) / out(u)))).sum
          v -> rnd12(0.15 / nodes.size + 0.85 * s.toDouble)
        }.toMap
      }
      nodes.foreach { v =>
        assert(got(v)._1 == r(v), s"seed $seed node $v: ${got(v)._1} vs ${r(v)}")
        assert(got(v)._2 == out(v).toLong, s"seed $seed outdeg $v")
      }
      // symmetric graph, no dangling ⇒ total mass ≈ 1 on the 12-dp grid
      assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-6, s"seed $seed")
    }
  }

  test("A-ES weighted sample: k >= n returns everything; order is scale-invariant") {
    import org.apache.spark.sql.functions.col
    val rowsGen = for {
      n <- Gen.choose(3, 12)
      ws <- Gen.listOfN(n, Gen.choose(0.5, 500.0))
    } yield ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    (1L to 8L).foreach { seed =>
      val rows = sample(rowsGen, seed)
      val df = rows.toDF("id", "w")
      def pick(k: Int, scale: Double) = WeightedSample.sampleByWeight(
          df.withColumn("w", col("w") * scale),
          key = col("id").cast("string"), weight = col("w"), k = k)
        .collect().map(_.getAs[Long]("id")).toSeq
      assert(pick(rows.size + 5, 1.0).toSet == rows.map(_._1).toSet,
        s"seed $seed: k >= n must return all rows")
      // scaling every weight by a constant rescales ln(u)/w uniformly —
      // the selected set AND its order cannot change
      assert(pick(3, 1.0) == pick(3, 7.5), s"seed $seed: not scale-invariant")
    }
  }

  test("snapshot diff classifies against a sequential model incl. null flips") {
    val snapGen = for {
      n <- Gen.choose(4, 15)
      olds <- Gen.listOfN(n, Gen.option(Gen.choose(0, 3)))
      news <- Gen.listOfN(n, Gen.option(Gen.choose(0, 3)))
      inOld <- Gen.listOfN(n, Gen.prob(0.8))
      inNew <- Gen.listOfN(n, Gen.prob(0.8))
    } yield (0 until n).map(i =>
      (i.toLong, olds(i).map(_.toString), news(i).map(_.toString),
        inOld(i), inNew(i)))
    (1L to 10L).foreach { seed =>
      val rows = sample(snapGen, seed)
      val oldDf = rows.filter(_._4).map(r => (r._1, r._2)).toDF("k", "v")
      val newDf = rows.filter(_._5).map(r => (r._1, r._3)).toDF("k", "v")
      val got = SnapshotDiff.diff(oldDf, newDf, "k", Seq("v")).collect()
        .map(r => r.getAs[Long]("key") -> r.getAs[String]("change")).toMap
      rows.foreach { case (k, ov, nv, inOld, inNew) =>
        val expected = (inOld, inNew) match {
          case (false, false) => None
          case (false, true) => Some("added")
          case (true, false) => Some("removed")
          case (true, true) =>
            Some(if (ov == nv) "unchanged" else "changed")
        }
        assert(got.get(k) == expected, s"seed $seed key $k")
      }
    }
  }
  test("jaro-winkler matches an independent sequential model on random strings") {
    // independent reference: a direct transcription of the classic
    // Winkler algorithm (match window, greedy first-unclaimed matching,
    // floor-halved transpositions, 0.7-gated 4-cap prefix boost) written
    // against plain Strings — no UTF8String machinery shared with the
    // expression under test
    def refJaro(s1: String, s2: String): Double = {
      val (l1, l2) = (s1.length, s2.length)
      if (l1 == 0 || l2 == 0) return 0.0
      val win = math.max(math.max(l1, l2) / 2 - 1, 0)
      val m2 = Array.fill(l2)(false)
      val matched1 = Array.fill(l1)(false)
      var m = 0
      for (i <- 0 until l1) {
        val hi = math.min(l2, i + win + 1)
        var j = math.max(0, i - win)
        var hit = false
        while (j < hi && !hit) {
          if (!m2(j) && s1(i) == s2(j)) {
            m2(j) = true; matched1(i) = true; m += 1; hit = true
          }
          j += 1
        }
      }
      if (m == 0) return 0.0
      var (t, k) = (0, 0)
      for (i <- 0 until l1 if matched1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      (m.toDouble / l1 + m.toDouble / l2 + (m - t / 2).toDouble / m) / 3.0
    }
    def refJw(s1: String, s2: String): Double = {
      val j = refJaro(s1, s2)
      if (j <= 0.7) j
      else {
        val l = s1.zip(s2).take(4).takeWhile { case (a, b) => a == b }.size
        j + 0.1 * l * (1.0 - j)
      }
    }
    import org.apache.spark.sql.graft.JaroWinklerImpl
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val gen = for {
      n1 <- Gen.choose(0, 14)
      n2 <- Gen.choose(0, 14)
      a <- Gen.stringOfN(n1, Gen.oneOf('a', 'b', 'c', 'd', ' '))
      b <- Gen.stringOfN(n2, Gen.oneOf('a', 'b', 'c', 'd', ' '))
    } yield (a, b)
    (1L to 800L).foreach { seed =>
      val (a, b) = sample(gen, seed)
      val got = JaroWinklerImpl.jw(u(a), u(b))
      val want = refJw(a, b)
      assert(got == want, s"seed $seed: jw('$a','$b') = $got, ref $want")
      assert(got == JaroWinklerImpl.jw(u(b), u(a)), s"seed $seed asymmetric")
      assert(got >= 0.0 && got <= 1.0)
    }
  }
}
