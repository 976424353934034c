package graft

// Scratch per-stage timer for the q414 r17 rewrite (driver tooling, not
// library surface): isolates the base-census build, the rollup consumers,
// and the per-shard window passes so the 2.8 -> 3.7 s regression of the
// one-fact-pass variant can be attributed.
object Diag414 {
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
    import graft.functions.TextFunctions.md5Hash60
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey"),
        md5Hash60(col("l_orderkey").cast("string")).as("h"))
    // warm-up
    noop(li)
    val base = timed("base census ckpt") {
      graft.plans.Eager.ckpt(
        li.select(pmod(col("h"), lit(8L)).as("shard8"), col("l_partkey"))
          .groupBy(col("shard8"), col("l_partkey"))
          .agg(count(lit(1)).as("cnt8")))
    }
    println("base partitions: " + base.rdd.getNumPartitions)
    val global = timed("global rollup ckpt") {
      graft.plans.Eager.ckpt(
        base.groupBy(col("l_partkey")).agg(sum(col("cnt8")).as("gcnt")))
    }
    timed("trueTop RangeRank") {
      noop(graft.operators.RangeRank
        .withGlobalRank(global, "trk",
          Seq(col("gcnt").desc, col("l_partkey")))
        .filter(col("trk") <= 10))
    }
    Seq(2, 4, 8).foreach { s =>
      timed(s"census+window s=$s") {
        val census = base
          .select(pmod(col("shard8"), lit(s.toLong)).as("shard"),
            col("l_partkey"), col("cnt8"))
          .groupBy(col("shard"), col("l_partkey"))
          .agg(sum(col("cnt8")).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"))
          .orderBy(col("cnt").desc, col("l_partkey"))
        noop(census.withColumn("lrk", row_number().over(w))
          .filter(col("lrk") <= 10))
      }
      timed(s"census-from-fact s=$s") {
        val census = li.select(pmod(col("h"), lit(s.toLong)).as("shard"),
            col("l_partkey"))
          .groupBy(col("shard"), col("l_partkey"))
          .agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"))
          .orderBy(col("cnt").desc, col("l_partkey"))
        noop(census.withColumn("lrk", row_number().over(w))
          .filter(col("lrk") <= 10))
      }
    }
    spark.stop()
  }
}
