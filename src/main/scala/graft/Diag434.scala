package graft

// Scratch per-stage timer for the q434/q438 shared pairFlags frame
// (driver tooling): attributes the wall between the image chain, the
// caption fingerprint/banding/verify chain, and the flag joins.
object Diag434 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
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
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val par = spark.sparkContext.defaultParallelism
    val Off = 100000000000L
    val d = timed("base ckpt") {
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 3 === 0 && length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("text"))
        .repartition(par, col("doc_id"))
        .localCheckpoint(true)
    }
    val caps = d.select(col("doc_id").as("pair_id"), col("text").as("cap"))
      .unionAll(d.select((col("doc_id") + lit(Off)).as("pair_id"),
        concat_ws(" ", transform(tokens(col("text")),
          t => concat(t, lit("_cva")))).as("cap")))
      .unionAll(d.select((col("doc_id") + lit(2 * Off)).as("pair_id"),
        col("text").as("cap")))
      .unionAll(d.select((col("doc_id") + lit(3 * Off)).as("pair_id"),
        concat(col("text"), lit(" zz extra tail")).as("cap")))
    timed("capfp+fpg")(noop(
      caps.select(col("pair_id"), fingerprint(col("cap")).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("g"), min(col("pair_id")).as("fmin"))))
    val capsh = timed("capsh ckpt") {
      caps.select(col("pair_id"), shingles(tokens(col("cap")), 3).as("sh"))
        .localCheckpoint(true)
    }
    val candc = timed("banded candidates ckpt") {
      graft.operators.BandStore.candidatePairs(
          capsh.withColumnRenamed("pair_id", "doc_id"))
        .select(col("a").as("a_id"), col("b").as("b_id"))
        .localCheckpoint(true)
    }
    println("cand pairs: " + candc.count())
    timed("jaccard verify (arrays)")(noop(
      candc
        .join(capsh.select(col("pair_id").as("a_id"), col("sh").as("a_sh")),
          "a_id")
        .join(capsh.select(col("pair_id").as("b_id"), col("sh").as("b_sh")),
          "b_id")
        .filter(jaccard(col("a_sh"), col("b_sh")) >= 0.5)
        .select(col("a_id"), col("b_id"))))
    timed("jaccard verify (relational)") {
      val inv = capsh.select(col("pair_id"),
        explode(array_distinct(col("sh"))).as("s"))
      val sz = capsh.select(col("pair_id"),
        size(array_distinct(col("sh"))).as("sz"))
      noop(candc
        .join(inv.select(col("pair_id").as("a_id"), col("s")), "a_id")
        .join(inv.select(col("pair_id").as("b_id"), col("s")),
          Seq("b_id", "s"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("inter"))
        .join(sz.select(col("pair_id").as("a_id"), col("sz").as("sza")),
          "a_id")
        .join(sz.select(col("pair_id").as("b_id"), col("sz").as("szb")),
          "b_id")
        .where(col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")) >= 0.5)
        .select(col("a_id"), col("b_id")))
    }
    timed("full pairFlags")(noop(
      graft.multimodal.CrossModal.pairFlags(spark, sfDir)))
    spark.stop()
  }
}
