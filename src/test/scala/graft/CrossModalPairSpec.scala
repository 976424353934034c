package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.{Codec, FrameH, FrameW, dhash56}

/** q434 cross-modal pair census, reconciled against a FULL plain-Scala
  * in-memory replay: the fixture texts are collected once, then both
  * modality pipelines — container build/decode/dHash, exact-hash
  * collapse, 4×14-bit banding with the 16-entry bucket cap, Hamming ≤ 8
  * verify (q370's chain), and fingerprint + MinHash-band + Jaccard ≥
  * 0.5 verify (q19/q22's chain) — are recomposed with scala.collection
  * operations (no Spark joins, no inverted-index code shared with the
  * implementation; only the two arithmetic primitives dhash56 and
  * MinHashP61.permute are reused, which is the point: the SPARK
  * COMPOSITION is what's under test). The decision-table census must
  * match row for row. */
class CrossModalPairSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Off = 100000000000L

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  private def toksOf(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  private def shinglesOf(s: String): Set[String] = {
    val t = toksOf(s)
    if (t.length < 3) Set(t.mkString(" "))
    else t.sliding(3).map(_.mkString(" ")).toSet
  }

  test("the census equals a plain-Scala replay of both modality pipelines") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where("doc_id % 3 = 0").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))

    // ---- image side: 4 hashes per base doc via the real containers
    val hashes: Seq[(Long, Long)] = docs.toSeq.flatMap { case (id, text) =>
      val src = text.getBytes(StandardCharsets.UTF_8)
      val dec = Codec.decode(Codec.buildPpm(
        Codec.cyclePayload(src, FrameW * FrameH * 3), FrameW, FrameH))
      val pert = Array.tabulate(dec.payload.length) { i =>
        val v = dec.payload(i) & 0xff
        (if (i % 37 == 0) math.min(v + 40, 255) else v).toByte
      }
      val msrc = s"zz$id $text".getBytes(StandardCharsets.UTF_8)
      val mdec = Codec.decode(Codec.buildPpm(
        Codec.cyclePayload(msrc, FrameW * FrameH * 3), FrameW, FrameH))
      Seq(id -> dhash56(dec.payload, 8, 8),
        (id + Off) -> dhash56(pert, 8, 8),
        (id + 2 * Off) -> dhash56(mdec.payload, 8, 8),
        (id + 3 * Off) -> dhash56(dec.payload, 8, 8))
    }
    val hGroup = hashes.groupBy(_._2)
      .map { case (h, xs) => h -> ((xs.size, xs.map(_._1).min)) }
    val distinctH = hGroup.keys.toSeq
    val buckets = (for (h <- distinctH; j <- 0 until 4)
      yield ((j, (h >> (14 * j)) & 16383L), h))
      .groupBy(_._1).values.map(_.map(_._2)).filter(_.size <= 16)
    val hEdges: Set[(Long, Long)] = buckets.flatMap { hs =>
      for (a <- hs; b <- hs if a < b) yield (a, b)
    }.toSet.filter { case (a, b) => java.lang.Long.bitCount(a ^ b) <= 8 }
    val nearMin: Map[Long, Long] =
      (hEdges.toSeq.map { case (a, b) => a -> hGroup(b)._2 } ++
        hEdges.toSeq.map { case (a, b) => b -> hGroup(a)._2 })
        .groupBy(_._1).map { case (h, xs) => h -> xs.map(_._2).min }
    val imgFlags: Map[Long, (Int, Int)] = hashes.map { case (id, h) =>
      val (g, hmin) = hGroup(h)
      val dup = g >= 2 || nearMin.contains(h)
      val drop = id > hmin || nearMin.get(h).exists(_ < id)
      id -> ((if (dup) 1 else 0, if (drop) 1 else 0))
    }.toMap

    // ---- caption side
    val caps: Seq[(Long, String)] = docs.toSeq.flatMap { case (id, text) =>
      Seq(id -> text,
        (id + Off) -> toksOf(text).map(_ + "_cva").mkString(" "),
        (id + 2 * Off) -> text,
        (id + 3 * Off) -> (text + " zz extra tail"))
    }
    val fp: Map[Long, String] = caps.map { case (id, c) =>
      id -> md5hex(c.trim.replaceAll("\\s+", " ").toLowerCase)
    }.toMap
    val fpGroup = caps.map(_._1).groupBy(fp)
      .map { case (f, ids) => f -> ((ids.size, ids.min)) }
    val sh: Map[Long, Set[String]] =
      caps.map { case (id, c) => id -> shinglesOf(c) }.toMap
    import org.apache.spark.sql.graft.MinHashP61
    val sig: Map[Long, Array[Long]] = caps.map { case (id, _) =>
      val hs = sh(id).map(h60)
      id -> Array.tabulate(16)(j =>
        hs.map(h => MinHashP61.permute(MinHashP61.a(j), MinHashP61.b(j), h))
          .min)
    }.toMap
    val capBuckets = caps.map(_._1)
      .flatMap(id => (0 until 8).map(b =>
        ((b, s"${sig(id)(2 * b)},${sig(id)(2 * b + 1)}"), id)))
      .groupBy(_._1).values.map(_.map(_._2))
    val jacc = (a: Long, b: Long) => {
      val (sa, sb) = (sh(a), sh(b))
      val i = sa.intersect(sb).size.toDouble
      i / (sa.size + sb.size - i)
    }
    val nearCap: Set[(Long, Long)] = capBuckets.flatMap { ids =>
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet.filter { case (a, b) => jacc(a, b) >= 0.5 }
    val capAny = nearCap.flatMap { case (a, b) => Seq(a, b) }
    val capLater = nearCap.map(_._2)
    val capFlags: Map[Long, (Int, Int)] = caps.map { case (id, _) =>
      val (g, fmin) = fpGroup(fp(id))
      val dup = g >= 2 || capAny.contains(id)
      val drop = id > fmin || capLater.contains(id)
      id -> ((if (dup) 1 else 0, if (drop) 1 else 0))
    }.toMap

    // ---- the expected census
    val expected = caps.map(_._1).groupBy(id =>
        (imgFlags(id)._1, capFlags(id)._1))
      .map { case ((imgDup, capDup), ids) =>
        (imgDup, capDup) -> ((ids.size.toLong,
          ids.count(imgFlags(_)._2 == 0).toLong,
          ids.count(capFlags(_)._2 == 0).toLong,
          ids.count(i => imgFlags(i)._2 == 0 && capFlags(i)._2 == 0).toLong,
          ids.count(i => !(imgFlags(i)._2 == 1 && capFlags(i)._2 == 1)).toLong))
      }

    val got = SparkEntry.queries("q434_crossmodal_pairs")(spark, sfDir)
      .collect().map { r =>
        (r.getAs[Int]("img_dup"), r.getAs[Int]("cap_dup")) ->
          ((r.getAs[Long]("n_pairs"), r.getAs[Long]("kept_image_dedup"),
            r.getAs[Long]("kept_caption_dedup"),
            r.getAs[Long]("kept_strict"),
            r.getAs[Long]("kept_pair_policy")))
      }.toMap

    assert(got == expected,
      s"census mismatch:\n  got:      $got\n  expected: $expected")

    // the planted quadrants must be populated and behave as designed:
    // base pairs are dup in both modalities (their +3e11 copy is an
    // exact image twin; their +2e11 variant an exact caption twin).
    // A base CAN still be dropped — natural cross-doc duplicates in the
    // fixture give some bases a smaller-id partner — but never by its
    // own planted variants (all at larger ids), so most bases survive.
    docs.foreach { case (id, _) =>
      assert(imgFlags(id)._1 == 1 && capFlags(id)._1 == 1,
        s"base pair $id must be (1,1)")
    }
    val baseKept = docs.count { case (id, _) =>
      imgFlags(id)._2 == 0 && capFlags(id)._2 == 0
    }
    assert(baseKept * 2 > docs.length,
      s"most base pairs must survive the strict policy ($baseKept/${docs.length})")
    assert(got.keySet.intersect(Set((1, 0), (0, 1), (1, 1))) ==
      Set((1, 0), (0, 1), (1, 1)),
      "the three planted interaction quadrants must all be populated")

    // q438 (the SHIPPED kept-pair corpus under the pair policy) must
    // reconcile exactly with q434's census: total = Σ kept_pair_policy,
    // per-quadrant group sizes equal, and no kept row has both drops
    val kept = SparkEntry.queries("q438_crossmodal_kept")(spark, sfDir)
      .collect()
    assert(kept.length.toLong ==
      got.values.map(_._5).sum,
      "q438 row count must equal q434's kept_pair_policy total")
    val keptByQuad = kept.groupBy(r =>
        (r.getAs[Int]("img_dup"), r.getAs[Int]("cap_dup")))
      .view.mapValues(_.length.toLong).toMap
    got.foreach { case (quad, (_, _, _, _, keptPp)) =>
      assert(keptByQuad.getOrElse(quad, 0L) == keptPp,
        s"quadrant $quad kept count must reconcile: " +
          s"${keptByQuad.getOrElse(quad, 0L)} vs $keptPp")
    }
    assert(kept.forall(r => !(r.getAs[Int]("img_drop") == 1 &&
      r.getAs[Int]("cap_drop") == 1)),
      "no kept pair may be dropped by BOTH modalities")
  }

  test("the audio pair census (q440) populates every planted quadrant with coherent policy counts") {
    val sfDir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q440_audiotext_pairs")(spark, sfDir)
      .collect().map { r =>
        (r.getAs[Int]("aud_dup"), r.getAs[Int]("txt_dup")) ->
          ((r.getAs[Long]("n_pairs"), r.getAs[Long]("kept_audio_dedup"),
            r.getAs[Long]("kept_transcript_dedup"),
            r.getAs[Long]("kept_strict"),
            r.getAs[Long]("kept_pair_policy")))
      }.toMap
    // the three planted interaction quadrants: re-recorded clip ×
    // unique transcript (1,0), unique clip × exact transcript (0,1),
    // identical clip × near transcript (1,1)
    assert(got.keySet.intersect(Set((1, 0), (0, 1), (1, 1))) ==
      Set((1, 0), (0, 1), (1, 1)),
      s"planted quadrants must be populated: ${got.keySet}")
    got.foreach { case (quad, (n, ka, kt, ks, kp)) =>
      assert(ks <= math.min(ka, kt) && math.max(ka, kt) <= kp && kp <= n,
        s"policy counts must nest (strict <= single <= pair <= all) " +
          s"at $quad: ($n, $ka, $kt, $ks, $kp)")
    }
    // a both-dup quadrant exists and the pair policy keeps strictly
    // more of it than the strict policy (the whole point of the pair
    // granularity)
    val bb = got((1, 1))
    assert(bb._5 > bb._4,
      s"pair policy must rescue pairs strict drops: $bb")
  }
}
