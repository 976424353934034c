package graft

// Scratch per-phase timer for the store-evolution certificates q436
// (band store) and q450 (boiler store), plus q435 (probe only): the
// lifecycle phases are semantics (ordered), but each phase's internal
// jobs (two bucketed table writes, the probe's batch-side derivation)
// may be independent — this attributes the wall so the §2.6 overlap and
// §2.4 reuse decisions are measured, not guessed.
object Diag450 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.operators.{BandStore, BoilerStore}
    import graft.queries.Kpis
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
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val par = spark.sparkContext.defaultParallelism
    val slug = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val tmp = System.getProperty("java.io.tmpdir")

    timed("warm-up q450")(
      force(BoilerStore.q450BoilerStoreEvolution(spark, sfDir)))

    // ---- q450 phase attribution
    locally {
      val Ntp = (0 until 24).map(i => f"ntp$i%02d").mkString(" ")
      val d = Kpis.table(spark, sfDir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("text"))
        .repartition(par, col("doc_id"))
      val wave = d.filter(col("doc_id") % 3 === 2)
        .select((col("doc_id") + lit(2000000000000L)).as("doc_id"),
          concat_ws(" ", lit(Ntp), col("text")).as("text"))
      val probe = timed("q450 probe ckpt")(
        d.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + lit(1000000000000L)).as("doc_id"),
            concat_ws(" ", lit(Ntp), col("text")).as("text"))
          .localCheckpoint(true))
      val table = s"graft_diag450_store$slug"
      val gcTable = s"graft_diag450_gc$slug"
      val path = s"$tmp/graft_diag450_store$slug"
      val gcPath = s"$tmp/graft_diag450_gc$slug"
      timed("q450 writeStore")(BoilerStore.writeStore(d, table, path))
      val p1 = timed("q450 probe1 ckpt")(
        BoilerStore.probeStore(probe, spark.table(BoilerStore.incTable(table)))
          .withColumn("phase", lit(1)).localCheckpoint(true))
      timed("q450 append")(BoilerStore.appendToStore(wave, table, path))
      val p2 = timed("q450 probe2 ckpt")(
        BoilerStore.probeStore(probe, spark.table(BoilerStore.incTable(table)))
          .withColumn("phase", lit(2)).localCheckpoint(true))
      timed("q450 retire")(BoilerStore.retireFromStore(spark, table,
        wave.select(col("doc_id")), gcTable, gcPath))
      val p3 = BoilerStore.probeStore(probe,
          spark.table(BoilerStore.incTable(gcTable)))
        .withColumn("phase", lit(3))
      timed("q450 probe3 + union + sort")(
        force(p1.unionAll(p2).unionAll(p3)
          .select(col("phase"), col("doc_id"), col("n_chunks"),
            col("n_eligible"), col("n_boiler_chunks"), col("boiler_tokens"),
            col("doc_tokens"), col("is_clean"))
          .orderBy("phase", "doc_id")))
    }
    timed("full q450 a")(
      force(BoilerStore.q450BoilerStoreEvolution(spark, sfDir)))

    // ---- q436 phase attribution
    timed("warm-up q436")(
      force(BandStore.q436BandStoreEvolution(spark, sfDir)))
    locally {
      val d = Kpis.table(spark, sfDir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), col("text"))
        .repartition(par, col("doc_id"))
      val gen1 = d.filter(col("doc_id") % 3 =!= 2)
      val delta = d.filter(col("doc_id") % 3 === 2)
      val retired = d.filter(col("doc_id") % 6 === 0 ||
        col("doc_id") % 9 === 2).select(col("doc_id"))
      val probe = timed("q436 probe ckpt")(
        d.filter(col("doc_id") % 4 === 0)
          .select((col("doc_id") + lit(1000000000000L)).as("doc_id"),
            concat(col("text"), lit(" zz extra tail")).as("text"))
          .localCheckpoint(true))
      val table = s"graft_diag436_store$slug"
      val gcTable = s"graft_diag436_gc$slug"
      val path = s"$tmp/graft_diag436_store$slug"
      val gcPath = s"$tmp/graft_diag436_gc$slug"
      def probeNow(t: String) = BandStore.probeStore(probe,
        spark.table(BandStore.bandsTable(t)),
        spark.table(BandStore.shinglesTable(t)))
      timed("q436 writeStore")(BandStore.writeStore(gen1, table, path))
      val p1 = timed("q436 probe1 ckpt")(
        probeNow(table).withColumn("phase", lit(1)).localCheckpoint(true))
      timed("q436 append")(BandStore.appendToStore(delta, table, path))
      val p2 = timed("q436 probe2 ckpt")(
        probeNow(table).withColumn("phase", lit(2)).localCheckpoint(true))
      timed("q436 retire")(BandStore.retireFromStore(spark, table,
        retired, gcTable, gcPath))
      val p3 = probeNow(gcTable).withColumn("phase", lit(3))
      timed("q436 probe3 + union + sort")(
        force(p1.unionAll(p2).unionAll(p3)
          .select(col("phase"), col("doc_id"), col("n_candidates"),
            col("n_matches"), col("best_jaccard"), col("best_match"),
            col("is_near_dup"))
          .orderBy("phase", "doc_id")))
    }
    timed("full q436 a")(
      force(BandStore.q436BandStoreEvolution(spark, sfDir)))
    timed("full q435 a")(
      force(BandStore.q435BandStoreProbe(spark, sfDir)))
    timed("full q435 b")(
      force(BandStore.q435BandStoreProbe(spark, sfDir)))
    spark.stop()
  }
}
