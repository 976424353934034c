package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** q360's VAD contract on a CONSTRUCTED payload (the oracle hash
  * certifies the replay; this spec certifies the segmentation
  * geometry): a 256-char text maps 1:1 onto the 256 PCM samples, so
  * frame energies — and the resulting active segments — are chosen
  * exactly, and `parsed_rate` must come from the real fmt-chunk walk. */
class AudioSegmentsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val rows = {
    val dir = Files.createTempDirectory("graft-audio")
    // 'A' (65): v = −63, frame energy 63²·32 = 127008 (active);
    // 'z' (122): v = −6, frame energy 36·32 = 1152 (quiet).
    // Frames: AA z AA zzz → active {0,1,3,4}: two 2-frame segments.
    val t1 = "A" * 64 + "z" * 32 + "A" * 64 + "z" * 96
    // all quiet
    val t2 = "z" * 256
    // doc ids ≡ 1 (mod 3) are the audio rows
    Seq((1L, t1, "en"), (4L, t2, "en"), (3L, "not audio", "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    Multimodal.q360AudioSegments(spark, dir.toString).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
  }

  test("only audio docs appear, with the rate from the real WAV parse") {
    assert(rows.keySet == Set(1L, 4L))
    rows.values.foreach(r => assert(r.getAs[Int]("parsed_rate") == 16000))
  }

  test("frame energies and segments are exact on the constructed payload") {
    val r = rows(1L)
    assert(r.getAs[Long]("n_frames") == 8L)
    assert(r.getAs[Long]("n_active") == 4L)
    assert(r.getAs[Long]("n_segments") == 2L)
    assert(r.getAs[Long]("longest_run") == 2L)
    assert(r.getAs[Long]("total_energy") == 4L * 127008 + 4L * 1152)
  }

  test("an all-quiet payload yields zero segments, not a missing row") {
    val r = rows(4L)
    assert(r.getAs[Long]("n_active") == 0L &&
      r.getAs[Long]("n_segments") == 0L && r.getAs[Long]("longest_run") == 0L)
    assert(r.getAs[Long]("total_energy") == 8L * 1152)
  }
}
