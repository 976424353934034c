package graft

// Plan-evidence dumper for the r17 jaccardScored rewrite: q198's final
// localCheckpoint collapses ExplainDump to Scan ExistingRDD, so this
// prints the REAL pre-checkpoint plan of the histogram frame under both
// verify spellings (the replaced array-intersect form is reconstructed
// inline — prefixCandidatePairs and TextFunctions.jaccard still exist).
object PlanDump198 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.operators.DupClusters
    import graft.functions.TextFunctions
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sh = DupClusters.q45ShingleTable(spark, sfDir)
    def hist(pairs: org.apache.spark.sql.DataFrame) = pairs
      .select(least(floor(col("j") * lit(20.0)), lit(19.0)).cast("int")
        .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("bucket"),
        (col("bucket").cast("double") / lit(20.0)).as("bucket_lo"),
        col("n_pairs"))
      .orderBy("bucket")
    val mode = args.drop(1).headOption.getOrElse("after")
    val frame = if (mode == "before") {
      hist(DupClusters.prefixCandidatePairs(sh, 0.3)
        .join(sh.select(col("id").as("a"), col("sh").as("sa")), "a")
        .join(sh.select(col("id").as("b"), col("sh").as("sb")), "b")
        .select(TextFunctions.jaccard(col("sa"), col("sb")).as("j"))
        .where(col("j") >= 0.3))
    } else hist(DupClusters.jaccardScored(sh, 0.3).select(col("j")))
    println(s"=== q198_similarity_histogram ($mode, pre-checkpoint) ===")
    println(frame.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    sh.unpersist()
    spark.stop()
  }
}
