package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver's BENCH_r{N}.json.
  *
  * Methodology: one untimed warm-up query first (session/codegen/JIT warm-up
  * otherwise lands on whichever query the Map yields first — it inflated q10
  * by ~18 s in round 1), then each query timed as a `noop`-format write so the
  * full plan including final projections/sorts executes (a bare `.count()`
  * lets Catalyst prune them).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // Optional args: bench only the named queries (local iteration); the
    // driver invokes with no args → full registered set.
    val selected: Seq[String] =
      if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // Full untimed warm-up pass: JIT/codegen/OS-cache warm-up otherwise
    // lands unevenly on whichever queries run first (single-query warm-up
    // still showed 10x run-to-run swings on the heavier entries).
    selected.foreach { n =>
      try run(n) catch { case _: Throwable => () }
    }
    // min of two timed runs per query: the shared JVM shows multi-second
    // GC/throttle spikes on otherwise sub-second plans; the minimum is the
    // steady-state cost. A run that throws contributes no time; a query with
    // NO successful run records the -1 sentinel (a broken query must not
    // masquerade as a fast one).
    val results = selected.map { name =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try { run(name); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    // Full-resolution per-query timings go to a file: the driver captures
    // only the last ~2000 chars of stdout, and a 100+-query JSON line is ~4 KB
    // — it has never fit (BENCH_r08/r09 record "parsed": null with the line
    // truncated mid-stream in the raw tail).
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"sf":"$sfDir"}"""
    try {
      val p = java.nio.file.Paths.get(sys.props("user.dir"), "BENCH_FULL.json")
      java.nio.file.Files.write(p, fullLine.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    // Round-stamped snapshot (VERDICT r16 #6): BENCH_FULL.json is
    // overwritten by EVERY Bench invocation — including the driver's own
    // round-end run and incidental smokes — which clobbered the round's
    // full-resolution evidence twice in r16. When the invoker sets
    // GRAFT_BENCH_STAMP (e.g. "r17"), the same line is ALSO written to
    // artifacts/BENCH_FULL_<stamp>.json, which the snapshot run commits;
    // unstamped invocations (the driver's) leave the artifact untouched.
    sys.env.get("GRAFT_BENCH_STAMP").foreach { stamp =>
      try {
        val dir = java.nio.file.Paths.get(sys.props("user.dir"), "artifacts")
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(s"BENCH_FULL_$stamp.json"),
          fullLine.getBytes("UTF-8"))
      } catch { case _: Throwable => () }
    }
    // The stdout JSON line must survive the driver's ~2000-char stdout TAIL:
    // round 11 proved a 1.8 KB line fits the window only until sbt's trailing
    // "[success]" noise head-truncates it (BENCH_r11 "parsed": null even
    // though the extracted line parses). So (VERDICT r11 #4): keep the line
    // UNDER ~850 chars — qNN-prefix keys, 0.1 s rounding, and the per-query
    // map truncated SLOWEST-FIRST to the budget with an explicit
    // "queries_omitted" count — and print it TWICE, so even if trailing noise
    // head-truncates the last copy, the first copy sits fully inside any
    // 2000-char tail (2×850 + noise < 2000 only guards the second copy; a
    // parser scanning the tail for '{"metric"' always finds copy #1 intact).
    // Full names + ns precision for ALL queries are always in BENCH_FULL.json.
    val prefixes = results.map(_._1.takeWhile(_ != '_'))
    val dup = prefixes.groupBy(identity).filter(_._2.size > 1).keySet
    if (dup.nonEmpty)
      System.err.println(s"[bench] qNN prefix collision, keeping full names " +
        s"for: ${dup.toSeq.sorted.mkString(",")}")
    val entries = results.zip(prefixes)
      .sortBy { case ((_, v), _) => -v }
      .map { case ((k, v), p) =>
        "\"" + (if (dup(p)) k else p) + "\":" + (math.rint(v * 10) / 10)
      }
    val budget = 850
    val tot2 = math.rint(total * 100) / 100
    def line(qs: Seq[String], omitted: Int): String = {
      val om = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      s"""{"metric":"total","value":$tot2,"unit":"sec","n_queries":${results.size},""" +
        s""""queries":${qs.mkString("{", ",", "}")}$om,""" +
        s""""full":"BENCH_FULL.json","sf":"$sfDir"}"""
    }
    var keep = entries.size
    while (keep > 1 && line(entries.take(keep), entries.size - keep).length > budget)
      keep -= 1
    val out = line(entries.take(keep), entries.size - keep)
    println(out)
    println(out)
    System.out.flush()
    spark.stop()
  }
}
