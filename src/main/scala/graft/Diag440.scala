package graft

// Scratch per-piece timer for q440_audiotext_pairs: the audio side
// (WAV decode + fp31 + banded Hamming verify) and the transcript side
// (fingerprint + banded Jaccard verify) are independent chains joined
// only at the final census — this attributes the wall between the two
// chains and their barriers to decide whether the §2.6 overlap and any
// per-task-work cut are worth it.
object Diag440 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val cm = graft.multimodal.CrossModal
    timed("warm-up q440")(force(cm.q440AudiotextPairs(spark, sfDir)))
    var last = System.nanoTime()
    def lap(name: String): Unit = {
      val now = System.nanoTime()
      println(f"  lap $name%-26s ${(now - last) / 1e9}%.2f s")
      last = now
    }
    timed("instrumented q440") {
      last = System.nanoTime()
      force(cm.q440Audiotext(spark, sfDir, lap))
    }
    timed("full q440 a")(force(cm.q440AudiotextPairs(spark, sfDir)))
    timed("full q440 b")(force(cm.q440AudiotextPairs(spark, sfDir)))
    spark.stop()
  }
}
