package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Kpis, ScrubQueries}
import graft.streaming.ClipStream

/** ClipStream's agreement contract: replaying the events log through
  * the live clipping gate admits EXACTLY the batch audit's kept_events
  * at the same bound, the total is invariant to how the replay is cut
  * into micro-batches, and no (user, day) cell ever admits beyond the
  * bound. */
class ClipStreamSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private val Bound = 4L

  private lazy val log: Seq[(Long, String)] = {
    import spark.implicits._
    Kpis.eventsTable(spark, sfDir)
      .select(col("user_id"), date_format(to_date(col("ts")), "yyyy-MM-dd")
        .as("day"))
      .as[(Long, String)].collect().toSeq
  }

  private lazy val batchKept: Long = ScrubQueries
    .q405ContributionClipping(spark, sfDir)
    .where(col("clip_bound") === Bound)
    .head().getAs[Long]("kept_events")

  private def replay(batches: Seq[Seq[(Long, String)]], name: String) = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = ClipStream
      .admissions(mem.toDF().toDF("user_id", "day"), Bound)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect()
    } finally q.stop()
  }

  test("streamed admissions sum to the batch audit's kept_events") {
    val rows = replay(log.grouped(97).toSeq, "clip_out")
    val admitted = rows.map(_.getAs[Long]("admitted")).sum
    assert(admitted == batchKept,
      s"stream admitted $admitted, batch q405 kept $batchKept at C=$Bound")
    val total = rows.map(_.getAs[Long]("batch_events")).sum
    assert(total == log.size.toLong, "every event must be accounted")
  }

  test("the total is invariant to the micro-batch split") {
    val a = replay(log.grouped(11).toSeq, "clip_a")
      .map(_.getAs[Long]("admitted")).sum
    val b = replay(Seq(log), "clip_b")
      .map(_.getAs[Long]("admitted")).sum
    assert(a == batchKept && b == batchKept, s"a=$a b=$b want $batchKept")
  }

  test("no (user, day) cell ever admits beyond the bound") {
    val rows = replay(log.grouped(53).toSeq, "clip_cap")
    rows.groupBy(r => (r.getAs[Long]("user_id"), r.getAs[String]("day")))
      .foreach { case (k, rs) =>
        val adm = rs.map(_.getAs[Long]("admitted")).sum
        assert(adm <= Bound, s"cell $k admitted $adm > $Bound")
        val seen = rs.map(_.getAs[Long]("seen_total")).max
        assert(adm == math.min(seen, Bound), s"cell $k: adm=$adm seen=$seen")
      }
  }
}
