// Plan-audit scratch main (driver tooling): stage timings for q81's
// blocked fuzzy-match pipeline. Run:
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run_main.sh graft.Profile81
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Profile81 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
      .withColumn("len", length(col("name")))
      .withColumn("h1", regexp_replace(col("name"), "(.).?", "$1"))
      .withColumn("h2", regexp_replace(col("name"), ".(.)?", "$1"))
    def side(tag: String) = c.select(
      col("id").as(s"id_$tag"), col("name").as(s"name_$tag"),
      col("len").as(s"len_$tag"), col("h1").as(s"h1_$tag"),
      col("h2").as(s"h2_$tag"))
    val a = side("1"); val b = side("2")
    def block(h: String) = a.join(b,
      col("len_1") === col("len_2") && col(s"${h}_1") === col(s"${h}_2") &&
        col("id_1") < col("id_2"))
    (1 to 2).foreach { round =>
      println(s"round $round")
      time("candidates h1 count")(println("    " + block("h1").count()))
      time("candidates both count")(println("    " +
        block("h1").unionAll(block("h2")).count()))
      // single-split verify: what q81 costs WITHOUT the probe-side
      // repartition — the levenshtein residual runs on one core
      time("verify single-split")(println("    " +
        block("h1").unionAll(block("h2"))
          .filter(levenshtein(col("name_1"), col("name_2")) <= 1).count()))
      time("full q81")(println("    " +
        graft.queries.EntityQueries.q81FuzzyNames(spark, sfDir).count()))
    }
    graft.queries.EntityQueries.q81FuzzyNames(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
