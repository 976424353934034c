package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Codec, MediaMeta, MediaRow}

/** Multimodal plumbing: real container round-trips (PPM/WAV/y4m),
  * malformed-input rejection, batch shape, per-kind aggregation. */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("frame sampling: every k-th index, at least one frame") {
    assert(Multimodal.sampleFrameIndices(10, 3) == Seq(0, 3, 6, 9))
    assert(Multimodal.sampleFrameIndices(1, 5) == Seq(0))
    assert(Multimodal.sampleFrameIndices(4, 0) == Seq(0, 1, 2, 3))
  }

  test("PPM round-trip: header fields and payload bytes recovered exactly") {
    val pixels = Array.tabulate(4 * 3 * 3)(i => (i * 7 % 256).toByte)
    val d = Codec.decode(Codec.buildPpm(pixels, 4, 3))
    assert(d.kind == "image" && d.width == 4 && d.height == 3 && d.frames == 1)
    assert(d.payload.sameElements(pixels))
  }

  test("WAV round-trip: fmt chunk parsed, data chunk extracted") {
    val samples = Array.tabulate(100)(i => (i % 256).toByte)
    val d = Codec.decode(Codec.buildWav(samples, 16000))
    assert(d.kind == "audio" && d.sampleRate == 16000 && d.frames == 1)
    assert(d.payload.sameElements(samples))
  }

  test("y4m round-trip: frame markers counted, planes concatenated in order") {
    val planes = Seq.tabulate(3)(f => Array.fill(8 * 8)((f + 1).toByte))
    val d = Codec.decode(Codec.buildY4m(planes, 8, 8))
    assert(d.kind == "video" && d.width == 8 && d.height == 8 && d.frames == 3)
    assert(d.payload.sameElements(planes.flatten))
  }

  test("malformed containers are rejected, not silently mis-featured") {
    // truncated PPM payload
    val ppm = Codec.buildPpm(Array.fill(8 * 8 * 3)(1.toByte), 8, 8)
    intercept[IllegalArgumentException](Codec.decode(ppm.dropRight(1)))
    // RIFF size field inconsistent with actual length
    val wav = Codec.buildWav(Array.fill(10)(1.toByte), 8000)
    intercept[IllegalArgumentException](Codec.decode(wav ++ Array(0.toByte)))
    // y4m frame cut mid-plane
    val y4m = Codec.buildY4m(Seq(Array.fill(64)(1.toByte)), 8, 8)
    intercept[IllegalArgumentException](Codec.decode(y4m.dropRight(5)))
    // unknown magic
    intercept[IllegalArgumentException](Codec.decode("nope".getBytes))
  }

  test("wav unknown chunk with negative size throws instead of hanging") {
    // an unrecognized chunk whose size field is -8 would leave the chunk
    // walk's offset unchanged forever without the size guard
    val wav = Codec.buildWav(Array.fill(10)(1.toByte), 8000)
    val junk = "junk".getBytes ++
      Array(0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte) // le32(-8)
    val bytes = wav.take(12) ++ junk ++ wav.drop(12)
    val sz = bytes.length - 8 // keep the RIFF size field consistent
    bytes(4) = (sz & 0xff).toByte; bytes(5) = ((sz >> 8) & 0xff).toByte
    bytes(6) = ((sz >> 16) & 0xff).toByte; bytes(7) = ((sz >> 24) & 0xff).toByte
    intercept[IllegalArgumentException](Codec.decode(bytes))
  }

  test("extractFeatures: parsed fields, payload stats, deterministic") {
    import spark.implicits._
    val px = Codec.cyclePayload("abc".getBytes, 8 * 8 * 3)
    val ds = Seq(
      MediaRow(1L, Codec.buildPpm(px, 8, 8), MediaMeta("image", 8, 8, 0, 1)),
      MediaRow(2L, Codec.buildWav(Array.fill(256)(65.toByte), 16000),
        MediaMeta("audio", 0, 0, 16000, 1)),
      MediaRow(3L, Codec.buildY4m(Seq.fill(2)(Array.fill(64)(7.toByte)), 8, 8),
        MediaMeta("video", 8, 8, 0, 2))
    ).toDS().repartition(2) // exercise the per-partition batch path
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(out.length == 3)
    val img = out(0)
    assert(img.kind == "image" && img.parsed_width == 8 &&
      img.decoded_frames == 1 && img.payload_len == 192)
    assert(img.payload_sum == px.map(_ & 0xff).map(_.toLong).sum)
    val aud = out(1)
    assert(aud.kind == "audio" && aud.parsed_sample_rate == 16000 &&
      aud.payload_len == 256 && aud.payload_sum == 256L * 65)
    assert(aud.entropy_bits == 0.0) // constant signal
    val vid = out(2)
    assert(vid.kind == "video" && vid.decoded_frames == 2 &&
      vid.payload_len == 128)
    val again = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(out.sameElements(again))
  }

  test("derived corpus containers parse back consistent with their metadata") {
    val rows = Multimodal.mediaFromDocuments(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val d = Codec.decode(r.content)
      assert(d.kind == r.meta.kind, s"media ${r.media_id} kind")
      assert(d.frames == r.meta.nFrames, s"media ${r.media_id} frames")
      assert(d.sampleRate == r.meta.sampleRate, s"media ${r.media_id} rate")
      assert(d.width == r.meta.width, s"media ${r.media_id} width")
    }
  }

  test("registered media query aggregates per kind deterministically") {
    val rows = Multimodal.q29MediaFeatures(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("kind")).toSeq == Seq("audio", "image", "video"))
    assert(rows.map(_.getAs[Long]("n_media")).sum == 500)
    val again = Multimodal.q29MediaFeatures(spark, sfDir).collect()
    assert(rows.sameElements(again))
  }
}
