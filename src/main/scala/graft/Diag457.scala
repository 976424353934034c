package graft

// r17 optimization scratch (driver tooling): stage-by-stage timing of
// q457_dedup_retrieval. Run: SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.Diag457 /root/testdata/sf0.1
object Diag457 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    import graft.functions.VectorFunctions.dotL
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag457] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val corpus = graft.queries.DocQueries.corpusWithNearDups(spark, sfDir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
    val ch = graft.queries.RetrievalQueries.chunkedPub(corpus)
      .withColumn("vec", graft.queries.RetrievalQueries.chunkVecNative(col("ctoks")))
      .select(col("doc_id"), col("chunk_id"),
        md5(concat_ws(" ", col("ctoks"))).as("fp"), col("vec"),
        dotL(col("vec"), col("vec")).as("n2"))
      .filter(col("n2") > 0)
    val qs = corpus.filter(col("doc_id") % 10 === 0 &&
        col("doc_id") < 100000L && size(col("toks")) >= 28)
      .select(col("doc_id").as("query_id"),
        slice(col("toks"), 4, 16).as("qtoks"))
      .withColumn("qvec", graft.queries.RetrievalQueries.chunkVecNative(col("qtoks")))
      .select(col("query_id"), col("qvec"), dotL(col("qvec"), col("qvec")).as("qn2"))
      .filter(col("qn2") > 0)
    val scored = ch.crossJoin(broadcast(qs))
      .withColumn("dot", dotL(col("vec"), col("qvec")))
      .withColumn("cos", col("dot").cast("double") /
        sqrt((col("qn2") * col("n2")).cast("double")))
      .select(col("query_id"), col("doc_id"), col("chunk_id"), col("fp"),
        col("cos"))

    // warm-up whole query once
    time("warmup full q457")(noop(graft.queries.RetrievalQueries
      .q457DedupRetrieval(spark, sfDir)))
    time("A ch only")(noop(ch))
    time("B scored BNLJ (no persist)")(noop(scored))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("doc_id"), col("chunk_id"))
    time("C scored->window top3")(noop(
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)))
    time("D scored->collapse groupBy")(noop(
      scored.groupBy(col("query_id"), col("fp"))
        .agg(min(struct(col("doc_id"), col("chunk_id"))).as("rep"),
          max(col("cos")).as("cos"))))
    time("B2 scored skinny no fp")(noop(scored.drop("fp")))
    time("E full q457 (2nd)")(noop(graft.queries.RetrievalQueries
      .q457DedupRetrieval(spark, sfDir)))
    spark.stop()
  }
}
