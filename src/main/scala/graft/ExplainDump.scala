package graft

// Driver-tooling plan dumper (companion to graft.ScaleStress/DiagScale,
// not part of the library surface): prints the FORMATTED physical plan of
// each named registered query at the given fixture, for the watched-plan
// artifacts the per-round plan audits read
// (artifacts/explain_r{N}_watched.txt).
//
// Usage: tools/run_main.sh graft.ExplainDump <sfDir> <q1,q2,...>
object ExplainDump {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val Array(sfDir, list) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // print the REAL pre-checkpoint plans: an eager localCheckpoint
    // collapses the dump to `Scan ExistingRDD` (see graft.plans.Eager).
    // Restored in the finally so a same-JVM caller (tests, a combined
    // tooling run) keeps the eager-release behavior afterwards.
    val prevEager = graft.plans.Eager.enabled
    graft.plans.Eager.enabled = false
    try {
      list.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
        println(s"\n======================= $name =======================")
        println(SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
    } finally graft.plans.Eager.enabled = prevEager
    spark.stop()
  }
}
