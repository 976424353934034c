package graft

// Driver-tooling profiling main: adjudicates salting vs AQE skew-join for
// the q63 shape (33% of lineitem remapped to one supplier key, joined to
// the supplier dim, aggregated to per-supplier revenue). Three variants:
//   salted16        — the registered plan-level rewrite (Salting.saltedJoin)
//   plain_aqe       — plain join, AQE defaults (dim broadcasts: no shuffle
//                     join at all — the fixture-scale winner by design)
//   plain_smj_skew  — broadcast forbidden so the join MUST shuffle, AQE
//                     skewJoin enabled: the scale-representative case where
//                     the "small" side is too big to broadcast
// Evidence base for artifacts/BENCH_NOTES_r09.md; not a registered query.
object ProfileQ63 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.{DataFrame, SparkSession}
    import org.apache.spark.sql.functions._
    import graft.functions.Salting
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def li(s: SparkSession) = s.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        when(col("l_orderkey") % 3 === 0, lit(1L))
          .otherwise(col("l_suppkey")).as("suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)").as("rev"),
        col("l_orderkey"), col("l_linenumber"))
    def sup(s: SparkSession) = s.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    def aggregate(joined: DataFrame): DataFrame = joined
      .groupBy(col("suppkey"), col("s_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

    def salted() = aggregate(Salting.saltedJoin(li(spark), sup(spark),
      "suppkey", struct(col("l_orderkey"), col("l_linenumber")),
      saltBuckets = 16))
    def plain() = aggregate(li(spark).join(sup(spark), "suppkey"))

    def run(label: String, mk: () => DataFrame,
            conf: Map[String, String]): Unit = {
      val prev = conf.keys.map(k => k -> spark.conf.get(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$label: min=${times.min}%.2f s runs=${times.map(t => f"$t%.2f").mkString(",")}")
      } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
    }

    val skewOn = Map("spark.sql.adaptive.skewJoin.enabled" -> "true")
    val noBcast = skewOn + ("spark.sql.autoBroadcastJoinThreshold" -> "-1")
    // warm the file scans once
    li(spark).write.format("noop").mode("overwrite").save()
    run("salted16        ", () => salted(), skewOn)
    run("plain_aqe       ", () => plain(), skewOn)
    run("plain_smj_skew  ", () => plain(), noBcast)
    run("salted16_nobcast", () => salted(), noBcast)
    spark.stop()
  }
}
