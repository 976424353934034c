package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExperimentQueries

/** q387's sequential contract: the verdict matches a plain-JVM replay
  * of Wald's walk over the same day census (first crossing wins), and
  * the reported final LLR reconciles with its own counts. */
class SprtSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = ExperimentQueries
    .q387SprtMonitor(spark, sfDir)
    .collect().map(r => r.getAs[Long]("arm") -> r).toMap

  test("two arms, verdicts from the documented boundary rule") {
    assert(rows.keySet == Set(0L, 1L))
    rows.values.foreach { r =>
      val v = r.getAs[String]("verdict")
      assert(Set("accept_h0", "accept_h1", "continue")(v))
      if (v == "continue")
        assert(r.getAs[String]("decision_day") == null, r.toString)
      else assert(r.getAs[String]("decision_day") != null, r.toString)
    }
  }

  test("the walk replays in plain JVM doubles") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.md5Hash60
    val byDay = graft.queries.Kpis.eventsTable(spark, sfDir)
      .withColumn("arm", pmod(md5Hash60(concat(lit("sprt:"),
        col("user_id").cast("string"))), lit(2L)))
      .groupBy(col("arm"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("k"))
      .collect()
      .groupBy(_.getAs[Long]("arm"))
    byDay.foreach { case (arm, days) =>
      val sorted = days.sortBy(_.getAs[java.sql.Date]("day").toString)
      var ck = 0L; var cn = 0L
      var verdict = "continue"; var decisionDay: String = null
      sorted.foreach { d =>
        ck += d.getAs[Long]("k"); cn += d.getAs[Long]("n")
        val llr = ck.toDouble * 0.200670695 +
          (cn - ck).toDouble * (-0.050010421)
        if (verdict == "continue") {
          if (llr >= 2.944438979) {
            verdict = "accept_h1"
            decisionDay = d.getAs[java.sql.Date]("day").toString
          } else if (llr <= -2.944438979) {
            verdict = "accept_h0"
            decisionDay = d.getAs[java.sql.Date]("day").toString
          }
        }
      }
      val r = rows(arm)
      assert(r.getAs[String]("verdict") == verdict,
        s"arm $arm: ${r.getAs[String]("verdict")} vs JVM $verdict")
      assert(r.getAs[String]("decision_day") == decisionDay,
        s"arm $arm decision day diverges")
    }
  }
}
