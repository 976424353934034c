package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** q370's fingerprint contract: dhash56 computes the documented
  * gradient-sign bits (hand-built images), is invariant to clip-free
  * uniform brightness shifts, and the query's recall ledger obeys the
  * planted-copy structure (≤ 2 bit flips per perturbed pixel → ≤ 12
  * Hamming for every planted pair the banding surfaces). */
class ImagePhashSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def rgb(f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val p = new Array[Byte](8 * 8 * 3)
    for (y <- 0 until 8; x <- 0 until 8) {
      val (r, g, b) = f(x, y)
      val o = (y * 8 + x) * 3
      p(o) = r.toByte; p(o + 1) = g.toByte; p(o + 2) = b.toByte
    }
    p
  }

  test("dhash56 sets exactly the documented gradient bits") {
    // row 0 strictly increasing, all other rows flat
    val img = rgb((x, y) => if (y == 0) (x * 10, 0, 0) else (5, 5, 5))
    assert(Multimodal.dhash56(img, 8, 8) == 0x7FL,
      "only the 7 row-0 gradient bits (positions 0..6) must be set")
    val flat = rgb((_, _) => (9, 9, 9))
    assert(Multimodal.dhash56(flat, 8, 8) == 0L,
      "a flat image has no ascending gradients (strict >)")
  }

  test("dhash56 is invariant to a clip-free uniform brightness shift") {
    val img = rgb((x, y) => (x * 7 + y, y * 3, (x + y) * 2))
    val brighter = img.map(b => ((b & 0xff) + 30).toByte)
    assert(Multimodal.dhash56(img, 8, 8) ==
      Multimodal.dhash56(brighter, 8, 8))
  }

  test("the recall ledger obeys the planted-copy structure") {
    val r = Multimodal.q370ImagePhashDedup(spark, sfDir).collect().head
    val total = r.getAs[Long]("planted_total")
    assert(total == r.getAs[Long]("n_images"))
    val exact = r.getAs[Long]("planted_exact")
    val reach = r.getAs[Long]("planted_band_reachable")
    val dups = r.getAs[Long]("planted_dups")
    // exact copies have all four bands equal, so reach dominates exact;
    // ham = 0 passes the <= 8 threshold, so dups dominates exact too
    assert(exact <= reach && reach <= total, r.toString)
    assert(exact <= dups && dups <= total, r.toString)
    // every 37th byte perturbed: 6 pixels, each flips <= 2 gradient bits
    assert(r.getAs[Long]("max_planted_ham") <= 12L,
      s"planted Hamming must be <= 12: $r")
    // with <= 12 scattered flips over 4x14 bands, most copies stay
    // band-reachable
    assert(reach * 10 >= total * 3,
      s"banding surfaced too few planted copies: $r")
    assert(r.getAs[Long]("dup_id_pairs_total") >=
      r.getAs[Long]("exact_dup_pairs"))
  }
}
