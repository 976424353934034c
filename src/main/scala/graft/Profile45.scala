package graft

// Driver-tooling profiling main: per-stage wall times for the q45
// near-dup clustering pipeline (shingles / candidates / edges / CC /
// output). Not registered as a query; companion to graft.Explain.
// Evidence base for the CC latency analysis in artifacts/BENCH_NOTES.
object Profile45 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
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
    // stage breakdown (mirrors q45DupClusters internals)
    val par = spark.sparkContext.defaultParallelism
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
    def variant(offset: Long, tail: String) =
      base.select((col("doc_id") + offset).as("id"),
        (if (tail.isEmpty) col("text") else concat(col("text"), lit(tail))).as("text"))
    val variants = variant(0L, "").unionByName(variant(100000L, " zz extra tail"))
      .unionByName(variant(200000L, " zz extra tail rr more pad"))
    val withShingles = variants.select(col("id"),
        array_distinct(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3)).as("sh"))
      .repartition(par, col("id"))
      .persist()
    time("shingles materialize")(withShingles.count())
    val cand = DupClusters.shingleCandidatePairs(withShingles, dfCap = 20)
    val candC = time("candidates")(cand.count())
    val edges = cand
      .join(withShingles.select(col("id").as("a"), col("sh").as("sa")), "a")
      .join(withShingles.select(col("id").as("b"), col("sh").as("sb")), "b")
      .where(TextFunctions.jaccard(col("sa"), col("sb")) >= 0.7)
      .select("a", "b")
    val edgesCk = time("edges + checkpoint")(edges.localCheckpoint(true))
    val (labels, rounds) = time("connected components")(
      DupClusters.connectedComponentsWithRounds(edgesCk, "a", "b"))
    println(s"rounds=$rounds")
    time("final join+sort")({
      val sizes = labels.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, "comp").orderBy("node").write.format("noop").mode("overwrite").save()
    })
    println(s"candidates=$candC")
    val t0 = System.nanoTime()
    DupClusters.q45DupClusters(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"full q45: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
