package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): image/audio/video carried as
  * opaque `binary` columns with typed metadata, processed in partition-local
  * batches.
  *
  * The actual media codecs are NOT in this environment, so the decode step is
  * a STUB — `FakeDecoder` below derives deterministic "pixels"/"samples" from
  * the bytes themselves (xxhash-style mixing), clearly marked as a fake. What
  * IS real and tested: the schema (binary payload + typed metadata struct),
  * the partition-batched execution shape (`mapPartitions` over an iterator —
  * the Scala analogue of a batched pandas UDF: one decoder init per
  * partition, streamed rows, no whole-partition materialization), and the
  * per-row feature extraction that runs as codegen'd expressions where
  * possible.
  *
  * Scale posture: media blobs are large; after the decode, only
  * metadata/features flow downstream so aggregations move kilobytes, not the
  * blobs. The decode itself is embarrassingly parallel but the source scan's
  * split count is NOT a reliable parallelism source (a single parquet file —
  * like the fixture corpus — scans as ONE split), so `q29MediaFeatures`
  * explicitly repartitions on `media_id` before the per-row decode, the same
  * pattern as the other compute-heavy per-row stages (q22/q26/q35). That one
  * shuffle moves the payload once, and buys a cluster-wide decode instead of
  * a one-core decode of whatever splits the scan happens to give.
  */
object Multimodal {

  /** Typed metadata accompanying an opaque media payload. */
  final case class MediaMeta(
      kind: String,          // "image" | "audio" | "video"
      width: Int,            // image/video frame width (0 for audio)
      height: Int,
      sampleRate: Int,       // audio sample rate (0 for image)
      nFrames: Int)          // video frames / audio chunks (1 for image)

  final case class MediaRow(
      media_id: Long,
      content: Array[Byte],
      meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long,
      mean_byte: Double,
      entropy_bits: Double,
      decoded_frames: Int)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sampleRate", IntegerType, nullable = false),
      StructField("nFrames", IntegerType, nullable = false))),
      nullable = false)))

  /** STUB decoder — deterministic fake standing in for libjpeg/ffmpeg/etc.
    * Produces `nFrames` pseudo-frames, each a `width×height` byte plane
    * derived from (content hash, frame index) with a splitmix64 mix. The
    * real implementation would replace ONLY this object; every caller keeps
    * the same batch shape. */
  object FakeDecoder {
    private def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    def contentHash(bytes: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }

    /** ??? in a real deployment: decode one frame to a byte plane. */
    def decodeFrame(content: Array[Byte], meta: MediaMeta, frame: Int): Array[Byte] = {
      val n = math.max(1, meta.width * meta.height)
      val seed = mix(contentHash(content) ^ frame.toLong)
      val out = new Array[Byte](n)
      var s = seed
      var i = 0
      while (i < n) { s = mix(s); out(i) = (s & 0xff).toByte; i += 1 }
      out
    }

    /** ??? in a real deployment: area-resample to (w, h). The fake keeps
      * determinism by re-deriving from the same seed stream. */
    def resize(plane: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (plane.isEmpty) new Array[Byte](w * h)
      else Array.tabulate(w * h)(i => plane(i % plane.length))
  }

  /** Every k-th frame index — the frame-sampling policy of a video
    * training-data pipeline (pure, unit-testable). */
  def sampleFrameIndices(nFrames: Int, every: Int): Seq[Int] =
    (0 until nFrames by math.max(1, every))

  /** Partition-batched decode + feature extraction: one pass per partition,
    * iterator-in/iterator-out (constant memory), decoder state initialized
    * once per partition — the exact execution shape a batched media UDF
    * needs, minus the real codec. */
  def extractFeatures(ds: Dataset[MediaRow], frameEvery: Int = 1): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // (real impl: initialize the codec/context HERE, once per partition)
      rows.map { r =>
        val bytes = Option(r.content).getOrElse(Array.emptyByteArray)
        val frames = sampleFrameIndices(math.max(1, r.meta.nFrames), frameEvery)
        val decoded = frames.map(f => FakeDecoder.decodeFrame(bytes, r.meta, f))
        val hist = new Array[Long](256)
        decoded.foreach(_.foreach(b => hist(b & 0xff) += 1))
        val total = hist.sum.toDouble
        val mean =
          if (total == 0) 0.0
          else hist.zipWithIndex.map { case (c, v) => c.toDouble * v }.sum / total
        val entropy =
          if (total == 0) 0.0
          else -hist.filter(_ > 0).map { c =>
            val p = c / total; p * math.log(p) / math.log(2.0)
          }.sum
        MediaFeatures(r.media_id, r.meta.kind, bytes.length,
          FakeDecoder.contentHash(bytes), mean, entropy, decoded.size)
      }
    }
  }

  /** Demo corpus: documents' text bytes standing in for opaque media blobs
    * (the fixture set has no real media). Metadata is derived
    * deterministically from doc_id. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"),
        struct(
          element_at(typedLit(Seq("image", "audio", "video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          lit(8).as("width"), lit(8).as("height"),
          when(col("doc_id") % 3 === 1, 16000).otherwise(0).as("sampleRate"),
          (col("doc_id") % 5 + 1).cast("int").as("nFrames")).as("meta"))
      .as[MediaRow]
  }

  /** Registered rows-only query: decode-stub + feature extraction over the
    * binary corpus, aggregated per media kind. */
  def q29MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Spread the decode across all cores: the fixture corpus is a single
    // parquet file (one scan split), and mapPartitions inherits the scan's
    // partitioning — without this shuffle the whole decode runs on one task.
    val spread = mediaFromDocuments(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
      .as[MediaRow]
    extractFeatures(spread, frameEvery = 2)
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("decoded_frames")).as("total_frames"),
        (sum(col("mean_byte")) / count(lit(1))).as("avg_mean_byte"),
        (sum(col("entropy_bits")) / count(lit(1))).as("avg_entropy_bits"))
      .orderBy("kind")
  }

  /** Rows-only entry (the splitmix fake decoder has no SQL twin). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_media_features" -> q29MediaFeatures _)
}
