package graft

// One-off diagnostic for the round-9 scale stress: candidate-pair counts
// for q55 (prefix filter) and q50 (sign-LSH bands) at 1x vs 10x, isolating
// which stage grows super-linearly. Not registered; companion to
// graft.ScaleStress.
object DiagScale {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = System.getProperty("java.io.tmpdir")
    Seq(1, 10).foreach { n =>
      val dir = s"$tmp/graft_scale_$n"
      val shs = graft.queries.CurationQueries.q55ShingleTable(spark, dir)
      val nDocs = shs.count()
      val cand = graft.operators.DupClusters.prefixCandidatePairs(shs, t = 0.9)
      val nCand = cand.count()
      // df distribution of the prefix-selected shingles
      val inv = shs.select(col("id"), explode(col("sh")).as("s"))
      val dfs = inv.groupBy("s").agg(count(lit(1)).as("df"))
      val stats = dfs.agg(max("df").as("max_df"), avg("df").as("avg_df"),
        count(lit(1)).as("n_shingles")).head()
      println(s"scale=$n q55: docs=$nDocs cand=$nCand " +
        s"shingles=${stats.getAs[Long]("n_shingles")} " +
        s"max_df=${stats.getAs[Long]("max_df")} " +
        f"avg_df=${stats.getAs[Double]("avg_df")}%.1f")
      shs.unpersist()
    }
    spark.stop()
  }
}
