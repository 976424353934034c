package graft

// Driver-tooling profiling main: per-stage wall times for the q45
// near-dup clustering pipeline (shingles / candidates / edges / CC /
// output). Not registered as a query; companion to graft.Explain.
// Evidence base for the CC latency analysis in artifacts/BENCH_NOTES.
object Profile45 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.operators.DupClusters
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
    DupClusters.q45DupClusters(spark, sfDir).write.format("noop").mode("overwrite").save()
    // stage breakdown over the SAME stage helpers q45DupClusters runs
    // (q45ShingleTable / prefixCandidatePairs / jaccardEdges) — the
    // profiler cannot drift from the registered pipeline
    val withShingles = DupClusters.q45ShingleTable(spark, sfDir)
    time("shingles materialize")(withShingles.count())
    val cand = DupClusters.prefixCandidatePairs(withShingles, t = 0.7)
    val candC = time("candidates")(cand.count())
    val edges = DupClusters.jaccardEdges(withShingles, threshold = 0.7)
    val edgesCk = time("edges + checkpoint")(edges.localCheckpoint(true))
    val (labels, rounds) = time("connected components")(
      DupClusters.connectedComponentsWithRounds(edgesCk, "a", "b"))
    println(s"rounds=$rounds")
    time("final join+sort")({
      val sizes = labels.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, "comp").orderBy("node").write.format("noop").mode("overwrite").save()
    })
    println(s"candidates=$candC")
    // release the stage cache so the end-to-end timing below rebuilds the
    // shingle table itself (CacheManager would otherwise serve it)
    withShingles.unpersist()
    val t0 = System.nanoTime()
    DupClusters.q45DupClusters(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"full q45: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
