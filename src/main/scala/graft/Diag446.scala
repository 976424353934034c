package graft

// Plan-step adjudication diagnostic (round 17; companion to
// graft.ScaleStress, not part of the library surface): when a sweep
// doubling reads above 2×, this prints the POST-AQE executed plan's
// join/exchange nodes at two scales to adjudicate whether the step is a
// one-time broadcast-to-shuffle plan switch (the q45/q434 pattern) or
// genuine super-linear growth. First written for q446 (whose 20×→40×
// reading of 3.29× resolved to exactly such a switch on the boiler fp
// join); now parameterized: args = [queryName, scaleA, scaleB].
object Diag446 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val name = args.headOption.getOrElse("q446_cdc_boilerplate")
    val scales = if (args.length >= 3) Seq(args(1).toInt, args(2).toInt)
      else Seq(20, 40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = System.getProperty("java.io.tmpdir")
    scales.foreach { n =>
      val dir = s"$tmp/graft_scale_$n"
      val df = SparkEntry.queries(name)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== $name at ${n}x: executed join/exchange nodes =====")
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .foreach(l => println(l.replaceAll("#\\d+L?", "")))
    }
    spark.stop()
  }
}
