package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.queries.ShardQueries

/** q385 + q386 contracts: the skew advisor's identities (straggler
  * factor >= 1, row conservation across layouts) and the multimodal
  * ledger's cross-consistency with the registered stage queries. */
class BucketLedgerSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q385: straggler factor >= 1; every layout conserves rows") {
    val rows = ShardQueries.q385BucketSkewAdvisor(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_buckets")).toSet ==
      Set(8L, 16L, 32L, 64L))
    rows.foreach { r =>
      assert(r.getAs[Double]("straggler_factor") >= 1.0 - 1e-9,
        s"max bucket cannot be below the uniform ideal: $r")
      assert(r.getAs[Long]("empty_buckets") >= 0L)
      assert(r.getAs[Double]("max_bucket_share") <= 1.0 + 1e-9)
    }
  }

  test("q386: four stages, ratios bounded, dedup rows match the stages") {
    val ledger = Multimodal.q386MultimodalLedger(spark, sfDir)
      .collect().map(r => r.getAs[String]("stage") -> r).toMap
    assert(ledger.keySet == Set("a_decode", "b_image_dedup",
      "c_audio_dedup", "d_audio_vad"))
    val img = Multimodal.q370ImagePhashDedup(spark, sfDir).collect().head
    assert(ledger("b_image_dedup").getAs[Long]("n_items") ==
      img.getAs[Long]("n_images"))
    assert(ledger("b_image_dedup").getAs[Long]("n_detected") ==
      img.getAs[Long]("dup_id_pairs_total"))
    Seq("b_image_dedup", "c_audio_dedup", "d_audio_vad").foreach { s =>
      val ratio = ledger(s).getAs[Double]("ratio")
      assert(ratio >= 0.0 && ratio <= 1.0 + 1e-9, s"$s ratio $ratio")
    }
  }
}
