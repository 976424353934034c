package graft

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamUpsert

/** Streaming upsert: at-least-once micro-batches + keyed MERGE must
  * converge the JDBC table to the batch keep-latest state even when a
  * whole prefix of a batch is REDELIVERED — the effectively-once
  * composition the sink documents. Driven against embedded Derby
  * through the same partition/batch/transaction path as production. */
class StreamUpsertSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftStreamUpsert;create=true"

  // Derby's standard-SQL MERGE: the key binds in the ON clause and
  // again in the INSERT arm, so the writer's paramOrder remaps the two
  // row columns onto four placeholders (0,1,0,1)
  private val mergeSql =
    """MERGE INTO sales_su t USING SYSIBM.SYSDUMMY1 s
      |ON t.sale_id = CAST(? AS VARCHAR(32))
      |WHEN MATCHED THEN UPDATE SET amount = CAST(? AS DOUBLE)
      |WHEN NOT MATCHED THEN INSERT (sale_id, amount)
      |  VALUES (CAST(? AS VARCHAR(32)), CAST(? AS DOUBLE))""".stripMargin

  private def query(sql: String): Seq[(String, Double)] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(sql)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      while (rs.next()) out += ((rs.getString(1), rs.getDouble(2)))
      out.toSeq
    } finally c.close()
  }

  test("redelivered micro-batches converge to the keep-latest state") {
    val c = DriverManager.getConnection(url)
    try c.createStatement().execute(
      "CREATE TABLE sales_su (sale_id VARCHAR(32) PRIMARY KEY, amount DOUBLE)")
    finally c.close()

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = StreamUpsert.start(
      mem.toDF().toDF("sale_id", "amount"), url, new Properties(),
      "sales_su", "sale_id", batchSize = 16, sqlOverride = Some(mergeSql),
      paramOrder = Some(Seq(0, 1, 0, 1)))
    try {
      // epoch 1: rows 1..100
      mem.addData((1 to 100).map(i => (s"s$i", i * 1.0)): _*)
      q.processAllAvailable()
      // epoch 2: REDELIVERS 50..100 with UPDATED amounts (the retry /
      // at-least-once case) plus fresh rows 101..150
      mem.addData((50 to 150).map(i => (s"s$i", i * 2.0)): _*)
      q.processAllAvailable()
      // epoch 3: full redelivery of epoch 2 verbatim — must be a no-op
      // for the final state (idempotence)
      mem.addData((50 to 150).map(i => (s"s$i", i * 2.0)): _*)
      q.processAllAvailable()

      val rows = query("SELECT sale_id, amount FROM sales_su").toMap
      assert(rows.size == 150)
      (1 to 49).foreach(i => assert(rows(s"s$i") == i * 1.0))
      (50 to 150).foreach(i => assert(rows(s"s$i") == i * 2.0))

      // epoch 4: ONE batch carrying CONFLICTING payloads for the same
      // keys (the nondeterministic-commit-order hole the pre-dedupe
      // closes) — the deterministic max-struct payload must win
      mem.addData((1 to 20).flatMap(i =>
        Seq((s"s$i", i * 7.0), (s"s$i", i * 3.0))): _*)
      q.processAllAvailable()
      val rows2 = query("SELECT sale_id, amount FROM sales_su").toMap
      assert(rows2.size == 150)
      (1 to 20).foreach(i => assert(rows2(s"s$i") == i * 7.0))
    } finally q.stop()
  }
}
