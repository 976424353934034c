package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Salting
import graft.sink.Warehouse

/** Date-partitioned warehouse sink (partition pruning) + salted
  * aggregation (skew mitigation). */
class WarehouseSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("warehouse write partitions by day and prunes on read") {
    val dir = Files.createTempDirectory("graft-wh").resolve("sales").toString
    val df = Seq(
      ("a", "2024-01-01 10:00:00", "c", "p", 1, 5.0),
      ("b", "2024-01-01 11:00:00", "c", "p", 1, 6.0),
      ("c", "2024-01-02 09:00:00", "c", "p", 2, 7.0))
      .toDF("sale_id", "sale_date", "customer_id", "product_id", "quantity", "amount")
      .withColumn("sale_date", to_timestamp(col("sale_date")))
    Warehouse.writeSales(df, dir)
    // physical layout: one directory per day
    val days = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(days.toSeq == Seq("sale_day=2024-01-01", "sale_day=2024-01-02"))
    // a day predicate reaches the scan as a PartitionFilter
    val pruned = Warehouse.readSales(spark, dir)
      .filter(col("sale_day") === "2024-01-01")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("sale_day"), s"no partition pruning in:\n$plan")
    assert(pruned.count() == 2)
    // append mode accumulates
    Warehouse.writeSales(df.filter(col("sale_id") === "a"), dir)
    assert(Warehouse.readSales(spark, dir).count() == 4)
  }

  test("ORC warehouse round-trips with the same layout and pruning contract") {
    val dir = Files.createTempDirectory("graft-wh-orc").resolve("sales").toString
    val df = Seq(
      ("a", "2024-01-01 10:00:00", "c", "p", 1, 5.0),
      ("b", "2024-01-02 11:00:00", "c", "p", 2, 6.0))
      .toDF("sale_id", "sale_date", "customer_id", "product_id", "quantity", "amount")
      .withColumn("sale_date", to_timestamp(col("sale_date")))
    Warehouse.writeSales(df, dir, format = "orc")
    val days = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(days.toSeq == Seq("sale_day=2024-01-01", "sale_day=2024-01-02"))
    assert(new java.io.File(dir, "sale_day=2024-01-01").listFiles()
      .exists(_.getName.endsWith(".orc")), "partition holds no .orc files")
    val pruned = Warehouse.readSales(spark, dir, format = "orc")
      .filter(col("sale_day") === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("sale_day"),
      s"no partition pruning in:\n$plan")
    assert(pruned.select("sale_id").as[String].collect().toSeq == Seq("b"))
  }

  test("day-partition compaction collapses files, preserves rows and pruning") {
    val dir = Files.createTempDirectory("graft-compact").resolve("sales").toString
    val df = (1 to 9).map(i => (s"c$i", "2024-02-01 10:00:00", "c", "p", 1, i * 1.0))
      .toDF("sale_id", "sale_date", "customer_id", "product_id", "quantity", "amount")
      .withColumn("sale_date", to_timestamp(col("sale_date")))
    // three appends → at least three files in the partition
    (0 until 3).foreach(i => Warehouse.writeSales(
      df.filter(col("amount") > i * 3.0 && col("amount") <= (i + 1) * 3.0), dir))
    val partDir = new java.io.File(s"$dir/sale_day=2024-02-01")
    val before = partDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 3)
    Warehouse.compactDay(spark, dir, "2024-02-01", targetFiles = 1)
    val after = partDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == 1)
    val back = Warehouse.readSales(spark, dir)
    assert(back.count() == 9)
    assert(back.filter(col("sale_day") === "2024-02-01").count() == 9)
  }

  test("salted aggregation equals plain aggregation on a skewed key") {
    // 10k rows of one hot key + scattered tail
    val hot = (1 to 10000).map(i => ("HOT", i.toDouble))
    val tail = (1 to 500).map(i => (s"k${i % 37}", i.toDouble))
    val df = (hot ++ tail).toDF("key", "v")
    val plain = df.groupBy("key")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Salting.saltedSumCount(df, "key", "v",
        saltCol = col("v"), saltBuckets = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
    // the stage-1 grouping genuinely spreads the hot key
    val spread = df.withColumn("_salt", pmod(hash(col("v")), lit(16)))
      .filter(col("key") === "HOT")
      .select(countDistinct(col("_salt"))).head().getLong(0)
    assert(spread == 16)
  }

  test("co-bucketed tables join and aggregate with no Exchange") {
    val base = Files.createTempDirectory("graft-bucketed")
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
      .select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Warehouse.writeBucketed(orders, "wh_orders",
        base.resolve("orders").toString, "o_custkey", nBuckets = 4)
      Warehouse.writeBucketed(cust, "wh_cust",
        base.resolve("cust").toString, "o_custkey", nBuckets = 4)
      // forbid broadcast so the join must pick SMJ — the property under
      // test is that the bucketed scans satisfy its distribution
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("wh_orders")
        .join(spark.table("wh_cust"), "o_custkey")
        .groupBy("o_custkey")
        .agg(sum("o_totalprice").as("rev"), count(lit(1)).as("n"))
      val expected = orders.join(cust, "o_custkey").groupBy("o_custkey")
        .agg(sum("o_totalprice").as("rev"), count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSet
      val got = joined.collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(got == expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg must be shuffle-free, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS wh_orders")
      spark.sql("DROP TABLE IF EXISTS wh_cust")
    }
  }
}
