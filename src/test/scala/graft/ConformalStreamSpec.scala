package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExperimentQueries
import graft.streaming.ConformalStream
import graft.streaming.ConformalStream.LineIn

/** Streaming conformal gate: replaying q367's held-out half through
  * [[ConformalStream.flags]] with the frozen (beta, q-hat) flags
  * EXACTLY the rows the registered batch cert counts as outside the
  * interval — and the flagged share matches 1 − coverage. */
class ConformalStreamSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  test("replayed held-out half reproduces the batch coverage ledger") {
    val (beta, qhat) = ConformalStream.fitFromDir(spark, sfDir)
    assert(qhat > 0L)
    val test = ExperimentQueries.conformalBase(spark, sfDir)
      .filter(col("grp") === 1L)
      .select(col("okey"), col("lnum"), col("y").as("y_cents"),
        col("q").as("qty"))
      .collect()
      .map(r => LineIn(r.getAs[Long]("okey"), r.getAs[Int]("lnum"),
        r.getAs[Long]("y_cents"), r.getAs[Long]("qty")))

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[LineIn]
    val q = ConformalStream.flags(mem.toDF(), beta, qhat)
      .writeStream.format("memory").queryName("conformal_flags")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = test.splitAt(test.length / 2)
      mem.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()
      val flagged = spark.table("conformal_flags").collect()
      val cert = ExperimentQueries.q367ConformalCert(spark, sfDir)
        .collect().head
      val outside = cert.getAs[Long]("n_test") -
        math.round(cert.getAs[Double]("coverage") *
          cert.getAs[Long]("n_test"))
      // coverage is 6-dp-snapped; reconstruct the exact outside count
      // from the raw residual rule instead and require exact agreement
      val exactOutside = test.count(l =>
        math.abs(l.y_cents * 1000L - beta * l.qty) > qhat)
      assert(flagged.length == exactOutside,
        s"stream flagged ${flagged.length}, direct rule says $exactOutside")
      assert(math.abs(flagged.length - outside) <= 1,
        s"flag count ${flagged.length} vs cert-implied $outside")
      flagged.foreach { r =>
        assert(r.getAs[Long]("resid_millicents") > qhat, r.toString)
        assert(r.getAs[Long]("qhat_millicents") == qhat)
      }
    } finally q.stop()
  }

  test("a constructed miskey flags; a conforming row passes") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[LineIn]
    val q = ConformalStream.flags(mem.toDF(), beta = 1000L, qhat = 500L)
      .writeStream.format("memory").queryName("conformal_gate2")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        LineIn(1L, 1, y_cents = 10L, qty = 10L),  // resid 0 -> pass
        LineIn(2L, 1, y_cents = 12L, qty = 10L))  // resid 2000 -> flag
      q.processAllAvailable()
      val rows = spark.table("conformal_gate2").collect()
      assert(rows.map(_.getAs[Long]("okey")).toSet == Set(2L))
      assert(rows.head.getAs[Long]("resid_millicents") == 2000L)
    } finally q.stop()
  }
}
