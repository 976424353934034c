package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** q374's fingerprint contract: the planted DC-shifted copies obey the
  * delta-sign robustness story (bounded Hamming, mostly band-
  * reachable), and the ledger identities hold. */
class AudioFpSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val r =
    Multimodal.q374AudioFpDedup(spark, sfDir).collect().head

  test("ledger identities") {
    val total = r.getAs[Long]("planted_total")
    assert(total == r.getAs[Long]("n_clips") && total > 0)
    val exact = r.getAs[Long]("planted_exact")
    val reach = r.getAs[Long]("planted_band_reachable")
    val dups = r.getAs[Long]("planted_dups")
    assert(exact <= reach && reach <= total, r.toString)
    assert(exact <= dups && dups <= total, r.toString)
    assert(r.getAs[Long]("dup_id_pairs_total") >=
      r.getAs[Long]("exact_dup_pairs"))
  }

  test("a +2 DC shift leaves most delta signs intact") {
    // delta signs flip only where neighbor energies are near-tied;
    // require the banding to surface a solid share of the copies
    val total = r.getAs[Long]("planted_total")
    assert(r.getAs[Long]("planted_band_reachable") * 10 >= total * 3,
      s"banding surfaced too few planted copies: $r")
    assert(r.getAs[Long]("max_planted_ham") <= 31L)
  }
}
