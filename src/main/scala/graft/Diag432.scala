package graft

// Scratch per-stage timer for q432_curation_v3 (driver tooling, r18):
// the suite's heaviest query is an 11-stage composition behind lazy
// stage persists + five retained checkpoints. This forces each barrier
// and each lazily-persisted stage IN ORDER and times the marginal cost,
// so the overlap/demotion decisions (guide §2.6 / §2.4) are made from
// attribution, not guesses. Forcing changes execution (the real query
// materializes the lazy stages inside its one ledger action), so the
// numbers are an upper bound on per-stage cost plus a lower bound on
// overlap potential; the full-query wall is timed at the end unchanged.
object Diag432 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.queries.CurationPipeline
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
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up: one full run so JIT/codegen/OS cache don't land on stage 0
    timed("warm-up full q432")(
      force(CurationPipeline.q432CurationV3(spark, sfDir)))

    import graft.queries.SubstringQueries.{BF, K, L}
    val JaccardMin = 0.5
    val st = new CurationPipeline.StageCache
    val (bench, s0, s1, s2, s3) = timed("frontStages (s3 ckpt)")(
      CurationPipeline.frontStages(spark, sfDir, withClone = true, st))
    timed("force s0")(force(s0))
    timed("force s1")(force(s1))
    timed("force s2")(force(s2))
    timed("force s3 (ckpt'd)")(force(s3))
    def positions(df: org.apache.spark.sql.DataFrame) =
      CurationPipeline.positionsOf(df)
    val bpos = positions(bench)
      .select(col("fp"), col("doc_id").as("bench_id"), col("p").as("bp"))
    val bprobe = bpos.join(
      bpos.groupBy(col("fp")).agg(count(lit(1)).as("n"))
        .filter(col("n") <= BF).select(col("fp")), "fp")
    def contamFlagged(df: org.apache.spark.sql.DataFrame) = positions(df)
      .select(col("fp"), col("doc_id"), col("p").as("cp"))
      .join(broadcast(bprobe), Seq("fp"))
      .withColumn("diag", col("cp") - col("bp"))
      .withColumn("iid", col("cp") - row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"), col("bench_id"), col("diag"))
          .orderBy(col("cp"))))
      .groupBy(col("doc_id"), col("bench_id"), col("diag"), col("iid"))
      .agg(count(lit(1)).as("rl"))
      .filter(col("rl") + lit(K - 1) >= L)
      .select("doc_id").distinct()
    val dirty = timed("dirty ckpt (probe on s3)")(
      contamFlagged(s3).localCheckpoint(true))
    val sh6 = timed("sh6 ckpt")(
      s3.select(col("doc_id"),
        graft.functions.TextFunctions.shingles(col("toks"), 3).as("sh"))
        .localCheckpoint(true))
    val edges = graft.operators.BandStore.candidatePairs(sh6)
      .join(sh6.select(col("doc_id").as("a"), col("sh").as("a_sh")), "a")
      .join(sh6.select(col("doc_id").as("b"), col("sh").as("b_sh")), "b")
      .filter(graft.functions.TextFunctions
        .jaccard(col("a_sh"), col("b_sh")) >= JaccardMin)
      .select(col("a"), col("b"))
    val comp = timed("edges + CC (comp ckpt)")(
      graft.operators.DupClusters.connectedComponents(edges, "a", "b")
        .select(col("node").as("doc_id"), col("comp"))
        .localCheckpoint(true))
    val s4 = st(s3.join(dirty, Seq("doc_id"), "left_anti"))
    timed("force s4 (contam gate)")(force(s4))
    val fp5 = s4.withColumn("fp", md5(array_join(col("toks"), " ")))
    val s5 = st(fp5
      .join(fp5.groupBy("fp").agg(min(col("doc_id")).as("keep_id")), "fp")
      .filter(col("doc_id") === col("keep_id"))
      .select("doc_id", "toks"))
    timed("force s5 (exact dedup)")(force(s5))
    val grp5 = s5.join(comp, Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("comp"), col("doc_id")))
    val s6 = st(grp5
      .join(grp5.groupBy("grp").agg(min(col("doc_id")).as("keep_id")),
        "grp")
      .filter(col("doc_id") === col("keep_id"))
      .select("doc_id", "toks"))
    timed("force s6 (cluster collapse)")(force(s6))
    val m7 = positions(s6)
    val keep7 = m7.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") <= graft.queries.SubstringQueries.F)
      .select(col("fp"))
    val mm7 = st(m7.join(keep7, "fp"))
    timed("force mm7 (df-capped pos)")(force(mm7))
    val runs7 = mm7.select(col("fp"), col("doc_id").as("a_id"),
        col("p").as("ap"))
      .join(mm7.select(col("fp"), col("doc_id").as("b_id"),
        col("p").as("bp")), Seq("fp"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("diag", col("ap") - col("bp"))
      .withColumn("iid", col("ap") - row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("a_id"), col("b_id"), col("diag"))
          .orderBy(col("ap"))))
      .groupBy(col("a_id"), col("b_id"), col("diag"), col("iid"))
      .agg(count(lit(1)).as("rl"), min(col("ap")).as("a0"))
      .filter(col("rl") + lit(K - 1) >= L)
    val spans7 = runs7
      .select(col("b_id").as("doc_id"), (col("a0") - col("diag")).as("s"),
        (col("a0") - col("diag") + col("rl") + lit(K - 2)).as("e"))
      .distinct()
    val w7 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val regs7 = spans7
      .withColumn("pme", max(col("e")).over(
        w7.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)))
      .withColumn("grp", sum(when(col("pme").isNull ||
        col("s") > col("pme") + 1, 1L).otherwise(0L)).over(
        w7.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("s")).as("rs"), max(col("e")).as("re"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("rs"), col("re"))))
        .as("regs"))
    val s7 = st(s6.join(regs7, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("regs").isNull, col("toks"))
          .otherwise(expr(
            "filter(toks, (x, i) -> NOT exists(regs, r -> i >= r.rs AND i <= r.re))"))
          .as("toks")))
    timed("force s7 (rewrite)")(force(s7))
    val flagged = s3.select(col("doc_id"), size(col("toks")).as("ntok"))
      .join(dirty.withColumn("isd", lit(1)), Seq("doc_id"), "left")
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ntok"),
        col("isd").isNotNull.as("is_dirty"),
        coalesce(col("comp"), col("doc_id")).as("grp"))
    val groups = flagged.groupBy(col("grp"))
      .agg(sum(when(!col("is_dirty"), 1L).otherwise(0L)).as("n_clean"),
        min(col("doc_id")).as("rep"),
        min(when(!col("is_dirty"), col("doc_id"))).as("clean_rep"))
    val rescued = groups
      .filter(col("n_clean") > 0 && col("rep") =!= col("clean_rep"))
    val rescRow = rescued
      .join(flagged.select(col("doc_id").as("clean_rep"), col("ntok")),
        "clean_rep")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("ntok").cast("long")), lit(0L)).as("n_tokens"))
    timed("force rescue row")(force(rescRow))
    val resid = contamFlagged(s7)
    val residRow = s7.join(resid, Seq("doc_id"), "leftsemi")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("toks")).cast("long")), lit(0L))
          .as("n_tokens"))
    timed("force residual row")(force(residRow))
    def census(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("toks")).cast("long")), lit(0L))
          .as("n_tokens"))
    val stages = Seq(
      (0, "ingest", s0), (1, "quality", s1), (2, "perplexity", s2),
      (3, "loop_gate", s3), (4, "contam_gate", s4),
      (5, "exact_dedup", s5), (6, "cluster_collapse", s6),
      (7, "substring_rewrite", s7))
    val ledger = stages.map { case (no, nm, cur) =>
      census(cur).select(lit(no).as("stage_no"), lit(nm).as("stage"),
        col("n_docs"), col("n_tokens"))
    }.reduce(_.unionAll(_))
    timed("force 8 censuses (cached)")(force(ledger))
    st.release()

    timed("full q432 (min of 2) a")(
      force(CurationPipeline.q432CurationV3(spark, sfDir)))
    timed("full q432 (min of 2) b")(
      force(CurationPipeline.q432CurationV3(spark, sfDir)))
    spark.stop()
  }
}
