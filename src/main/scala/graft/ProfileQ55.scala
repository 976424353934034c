package graft

// Driver-tooling profiling main: per-stage wall times for the q55
// containment-dedup pipeline (shingle table / candidates / verify).
// Not registered as a query; companion to graft.Profile45.
object ProfileQ55 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import graft.operators.DupClusters
    import graft.queries.CurationQueries
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    CurationQueries.q55ContainmentDup(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // stage breakdown over the SAME helpers the registered entry runs
    val shs = CurationQueries.q55ShingleTable(spark, sfDir)
    time("shingle table materialize")(shs.count())
    val cand = DupClusters.prefixCandidatePairs(shs, t = 0.9)
    val candC = time("candidates")(cand.count())
    val out = CurationQueries.q55Verify(shs, cand, threshold = 0.9)
    val outC = time("verify")(out.count())
    println(s"candidates=$candC verified=$outC")
    shs.unpersist()
    val t0 = System.nanoTime()
    CurationQueries.q55ContainmentDup(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println(f"full q55: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
