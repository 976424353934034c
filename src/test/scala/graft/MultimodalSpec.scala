package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{FakeDecoder, MediaMeta, MediaRow}

/** Multimodal plumbing: schema, batch shape, determinism of the stubbed
  * decode, frame sampling policy. */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("frame sampling: every k-th index, at least one frame") {
    assert(Multimodal.sampleFrameIndices(10, 3) == Seq(0, 3, 6, 9))
    assert(Multimodal.sampleFrameIndices(1, 5) == Seq(0))
    assert(Multimodal.sampleFrameIndices(4, 0) == Seq(0, 1, 2, 3))
  }

  test("fake decoder is deterministic and shapes to width*height") {
    val meta = MediaMeta("image", 4, 3, 0, 1)
    val a = FakeDecoder.decodeFrame("hello".getBytes, meta, 0)
    val b = FakeDecoder.decodeFrame("hello".getBytes, meta, 0)
    val c = FakeDecoder.decodeFrame("hello".getBytes, meta, 1)
    assert(a.sameElements(b))
    assert(!a.sameElements(c)) // frame index enters the seed
    assert(a.length == 12)
    assert(FakeDecoder.resize(a, 2, 2).length == 4)
  }

  test("extractFeatures: one row per media, stable across runs") {
    import spark.implicits._
    val ds = Seq(
      MediaRow(1L, "abc".getBytes, MediaMeta("image", 4, 4, 0, 1)),
      MediaRow(2L, "defghij".getBytes, MediaMeta("video", 4, 4, 0, 6)),
      MediaRow(3L, null, MediaMeta("audio", 0, 0, 16000, 3))
    ).toDS().repartition(2) // exercise the per-partition batch path
    val out1 = Multimodal.extractFeatures(ds, frameEvery = 2)
      .collect().sortBy(_.media_id)
    val out2 = Multimodal.extractFeatures(ds, frameEvery = 2)
      .collect().sortBy(_.media_id)
    assert(out1.length == 3)
    assert(out1.map(_.media_id).sameElements(out2.map(_.media_id)))
    assert(out1.map(_.checksum).sameElements(out2.map(_.checksum)))
    // video with 6 frames sampled every 2 → 3 decoded frames
    assert(out1.find(_.media_id == 2L).get.decoded_frames == 3)
    // null payload handled, entropy of empty content is 0
    assert(out1.find(_.media_id == 3L).get.n_bytes == 0)
  }

  test("registered media query aggregates per kind deterministically") {
    val rows = Multimodal.q29MediaFeatures(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("kind")).toSeq == Seq("audio", "image", "video"))
    assert(rows.map(_.getAs[Long]("n_media")).sum == 500)
    val again = Multimodal.q29MediaFeatures(spark, sfDir).collect()
    assert(rows.sameElements(again))
  }
}
