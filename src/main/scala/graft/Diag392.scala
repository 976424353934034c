package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// One-off diagnostic (round 15): which q392 stage grows super-linearly
// at the 10x clone fixture? Replays the q392 chain with per-segment
// shuffle-write deltas. Not registered; companion to graft.ScaleStress.
object Diag392 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        sb.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def seg[T](name: String, scale: Int)(f: => T): T = {
      val b0 = sb.get(); val t0 = System.nanoTime()
      val r = f
      println(f"scale=$scale%2d $name%-18s ${(System.nanoTime()-t0)/1e9}%7.2f s  " +
        f"shuffle=${(sb.get()-b0)/1048576.0}%9.2f MiB")
      r
    }
    val tmp = System.getProperty("java.io.tmpdir")
    Seq(10, 20).foreach { n =>
      val dir = s"$tmp/graft_scale_$n"
      // replicate q392's stages with explicit materialization barriers
      import graft.functions.TextFunctions.tokens
      import graft.queries.DocQueries
      val K = 8; val F = 8; val L = 16
      val par = spark.sparkContext.defaultParallelism
      val corpus = DocQueries.corpusWithNearDups(spark, dir)
        .select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
        .filter(size(col("toks")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def runsOf(toksDf: org.apache.spark.sql.DataFrame) = {
        val d = toksDf.filter(size(col("toks")) >= K)
          .repartition(par, col("doc_id"))
        val sh = d.select(col("doc_id"),
          posexplode(transform(sequence(lit(0), size(col("toks")) - K),
            i => md5(array_join(slice(col("toks"), i + lit(1), lit(K)), " "))))
            .as(Seq("p", "fp")))
        val keep = sh.groupBy(col("fp"))
          .agg(countDistinct(col("doc_id")).as("df"))
          .filter(col("df") <= F).select(col("fp"))
        val m = sh.join(keep, "fp")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val matches = m.select(col("fp"), col("doc_id").as("a_id"),
            col("p").as("ap"))
          .join(m.select(col("fp"), col("doc_id").as("b_id"),
            col("p").as("bp")), Seq("fp"))
          .filter(col("a_id") < col("b_id"))
        import org.apache.spark.sql.expressions.Window
        val isl = matches.withColumn("diag", col("ap") - col("bp"))
          .withColumn("iid", col("ap") - row_number().over(
            Window.partitionBy(col("a_id"), col("b_id"), col("diag"))
              .orderBy(col("ap"))))
        (isl.groupBy(col("a_id"), col("b_id"), col("diag"), col("iid"))
          .agg(count(lit(1)).as("rl"), min(col("ap")).as("a0"))
          .withColumn("b0", col("a0") - col("diag")), m)
      }
      // segmented pass 1
      val d1 = corpus.filter(size(col("toks")) >= K)
        .repartition(par, col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      seg("p1_repart", n) { d1.count() }
      val sh1 = d1.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("toks")) - K),
          i => md5(array_join(slice(col("toks"), i + lit(1), lit(K)), " "))))
          .as(Seq("p", "fp")))
      val keep1 = sh1.groupBy(col("fp"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") <= F).select(col("fp"))
      val m1 = sh1.join(keep1, "fp")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      seg("p1_cap_join", n) { m1.count() }
      val matches1 = m1.select(col("fp"), col("doc_id").as("a_id"),
          col("p").as("ap"))
        .join(m1.select(col("fp"), col("doc_id").as("b_id"),
          col("p").as("bp")), Seq("fp"))
        .filter(col("a_id") < col("b_id"))
      import org.apache.spark.sql.expressions.Window
      val isl1 = matches1.withColumn("diag", col("ap") - col("bp"))
        .withColumn("iid", col("ap") - row_number().over(
          Window.partitionBy(col("a_id"), col("b_id"), col("diag"))
            .orderBy(col("ap"))))
      val runs1 = isl1.groupBy(col("a_id"), col("b_id"), col("diag"), col("iid"))
        .agg(count(lit(1)).as("rl"), min(col("ap")).as("a0"))
        .withColumn("b0", col("a0") - col("diag"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val r1 = seg("p1_match_stitch", n) { runs1.count() }
      println(s"  runs1=$r1")
      val mcount = seg("p1_match_count", n) { matches1.count() }
      println(s"  matches1=$mcount")
      d1.unpersist()
      import org.apache.spark.sql.expressions.Window
      val spans = runs1.filter(col("rl") + lit(K - 1) >= L)
        .select(col("b_id").as("doc_id"), col("b0").as("s"),
          (col("b0") + col("rl") + lit(K - 2)).as("e")).distinct()
      val w = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
      val regions = spans
        .withColumn("pme", max(col("e")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("grp", sum(when(col("pme").isNull ||
          col("s") > col("pme") + 1, 1L).otherwise(0L)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("grp"))
        .agg(min(col("s")).as("rs"), max(col("e")).as("re"))
      val regs = regions.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("rs"), col("re")))).as("regs"))
      val cleaned = corpus.join(regs, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("regs").isNull, col("toks"))
            .otherwise(expr("filter(toks, (x, i) -> NOT exists(regs, r -> i >= r.rs AND i <= r.re))"))
            .as("toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nc = seg("regions+clean", n) { cleaned.count() }
      println(s"  cleaned=$nc")
      // segmented pass 2
      val d2 = cleaned.filter(size(col("toks")) >= K)
        .repartition(par, col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      seg("p2_repart", n) { d2.count() }
      val sh2b = d2.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("toks")) - K),
          i => md5(array_join(slice(col("toks"), i + lit(1), lit(K)), " "))))
          .as(Seq("p", "fp")))
      val keep2 = sh2b.groupBy(col("fp"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") <= F).select(col("fp"))
      val m2b = sh2b.join(keep2, "fp")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      seg("p2_cap_join", n) { m2b.count() }
      val matches2 = m2b.select(col("fp"), col("doc_id").as("a_id"),
          col("p").as("ap"))
        .join(m2b.select(col("fp"), col("doc_id").as("b_id"),
          col("p").as("bp")), Seq("fp"))
        .filter(col("a_id") < col("b_id"))
      val isl2 = matches2.withColumn("diag", col("ap") - col("bp"))
        .withColumn("iid", col("ap") - row_number().over(
          Window.partitionBy(col("a_id"), col("b_id"), col("diag"))
            .orderBy(col("ap"))))
      val runs2 = isl2.groupBy(col("a_id"), col("b_id"), col("diag"), col("iid"))
        .agg(count(lit(1)).as("rl"))
      val r2 = seg("p2_match_stitch", n) { runs2.count() }
      println(s"  runs2=$r2")
      val m2 = m2b
      d2.unpersist()
      // candidate-volume censuses for the pass-2 join
      val sh2 = cleaned.filter(size(col("toks")) >= K)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0), size(col("toks")) - K),
            i => md5(array_join(slice(col("toks"), i + lit(1), lit(K)), " "))))
            .as(Seq("p", "fp")))
      val dfs2 = sh2.groupBy("fp").agg(countDistinct("doc_id").as("df"))
      val st = dfs2.filter(col("df") <= F)
        .agg(sum(col("df") * col("df")).as("sq"), count(lit(1)).as("nfp")).head()
      println(s"  pass2 kept_fps=${st.getAs[Long]("nfp")} sum_df2=${st.getAs[Long]("sq")}")
      m1.unpersist(); m2.unpersist(); runs1.unpersist()
      corpus.unpersist(); cleaned.unpersist()
    }
    spark.stop()
  }
}
