package graft

// Scratch per-stage timer for q198 (driver tooling): attributes the wall
// between the candidate stage, the array-attach joins, and the per-pair
// intersect verify, and sizes the frames.
object Diag198 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.operators.DupClusters
    import graft.functions.TextFunctions
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
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val sh = DupClusters.q45ShingleTable(spark, sfDir)
    timed("shingle table fill")(noop(sh))
    println("docs: " + sh.count())
    println("avg |sh|: " + sh.select(avg(size(col("sh")))).first().getDouble(0))
    val cand = DupClusters.prefixCandidatePairs(sh, 0.3)
      .localCheckpoint(true)
    timed("cand pairs (ckpt'd above)")(())
    println("cand pairs: " + cand.count())
    timed("verify join+intersect") {
      noop(cand
        .join(sh.select(col("id").as("a"), col("sh").as("sa")), "a")
        .join(sh.select(col("id").as("b"), col("sh").as("sb")), "b")
        .select(TextFunctions.jaccard(col("sa"), col("sb")).as("j"))
        .where(col("j") >= 0.3))
    }
    // co-occurrence alternative: |inter| from the inverted index
    timed("co-occurrence inter+hist") {
      val inv = sh.select(col("id"), explode(col("sh")).as("s"))
      val sz = sh.select(col("id"), size(col("sh")).as("sz"))
      val co = inv.select(col("id").as("a"), col("s"))
        .join(inv.select(col("id").as("b"), col("s")), "s")
        .where(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("inter"))
      noop(co
        .join(sz.select(col("id").as("a"), col("sz").as("sza")), "a")
        .join(sz.select(col("id").as("b"), col("sz").as("szb")), "b")
        .select((col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter"))).as("j"))
        .where(col("j") >= 0.3))
    }
    sh.unpersist()
    spark.stop()
  }
}
