package graft

// One-off diagnostic (round 17; companion to graft.ScaleStress, not part
// of the library surface): q446's 20×→40× shuffle doubling read 3.29×
// in the sweep — this prints the POST-AQE executed plan's join/exchange
// nodes at both scales to adjudicate whether the step is a one-time
// broadcast-to-shuffle plan switch (the q45/q434 pattern) or genuine
// super-linear growth.
object Diag446 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
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
    Seq(20, 40).foreach { n =>
      val dir = s"$tmp/graft_scale_$n"
      val df = SparkEntry.queries("q446_cdc_boilerplate")(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(s"===== q446 at ${n}x: executed join/exchange nodes =====")
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange"))
        .foreach(l => println(l.replaceAll("#\\d+L?", "")))
    }
    spark.stop()
  }
}
