package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.ConsistentSample

/** Typed bottom-k Aggregator: window-formulation equivalence, partition
  * invariance, partial-aggregation plan shape. */
class ConsistentSampleSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("aggregator equals the window top-k formulation") {
    val viaAgg = ConsistentSample.q38ConsistentSample(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("k"), col("doc_id"))
    val viaWindow = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("k"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 8)
      .select(col("lang"), (col("rk") - 1).cast("int").as("pos"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("sample is invariant to input partitioning (merge associativity)") {
    import spark.implicits._
    import ConsistentSample.SampleIn
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"),
        TextFunctions.fingerprint(col("text")).as("sortKey"),
        col("doc_id").as("docId"))
    def run(parts: Int): Set[(String, Seq[Long])] =
      base.repartition(parts).as[SampleIn]
        .groupByKey(_.lang)
        .agg(new ConsistentSample.BottomK(8).toColumn.name("s"))
        .collect().map { case (l, s) => (l, s) }.toSet
    assert(run(1) == run(13))
  }

  test("plan partially aggregates (ObjectHashAggregate with partial merge)") {
    val plan = ConsistentSample.q38ConsistentSample(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"plan:\n$plan")
    assert(plan.toLowerCase.contains("partial_"), s"no partial agg in:\n$plan")
  }
}
