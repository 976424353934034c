package graft

// Scratch per-stage timer for q437's prelude (driver tooling): the
// frozen-artifact builds (scoring LM, benchmark index, fingerprint
// store, band store) run sequentially before the verdict pass — this
// attributes the wall to decide whether overlapping independent builds
// (guide §2.6) is worth it.
object Diag437 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.queries.Kpis
    import graft.functions.TextFunctions
    import graft.streaming.{AdmissionStream, ContamStream}
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
    val par = spark.sparkContext.defaultParallelism
    val d = timed("corpus ckpt") {
      Kpis.table(spark, sfDir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("text"),
          TextFunctions.tokens(lower(col("text"))).as("toks"))
        .repartition(par, col("doc_id"))
    }
    val bench = timed("bench ckpt")(
      d.filter(col("doc_id") % 10 === 7).localCheckpoint(true))
    val body = timed("body ckpt")(
      d.filter(col("doc_id") % 10 =!= 7).localCheckpoint(true))
    timed("lmIndex (collect)")(
      AdmissionStream.lmIndex(body.select(col("doc_id"), col("toks"))))
    timed("benchIndex (collect)")(
      ContamStream.benchIndex(bench.select(col("doc_id"), col("text"))))
    val slug = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val tmp = System.getProperty("java.io.tmpdir")
    timed("fp store write")(
      graft.operators.IncrementalDedup.writeStore(
        body.select(TextFunctions.fingerprint(col("text")).as("fp")),
        s"graft_diag437_fp$slug", s"$tmp/graft_diag437_fp$slug"))
    timed("band store write")(
      graft.operators.BandStore.writeStore(
        body.select(col("doc_id"),
          array_join(col("toks"), " ").as("text")),
        s"graft_diag437_band$slug", s"$tmp/graft_diag437_band$slug"))
    timed("full q437") {
      graft.streaming.CurationGateStream
        .q437LiveGateReplay(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    timed("full q437 again") {
      graft.streaming.CurationGateStream
        .q437LiveGateReplay(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
