package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.queries.{Kpis, MiningQueries, QuantQueries, Tpch6Queries}

/** Round-12b invariants for the new TPC-H shapes, frequency mining, and
  * SQ8 certification (the oracle hashes pin exact values; these assert
  * the algorithmic properties that must hold on ANY input). */
class Round12bSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q160 two-pass Misra-Gries result EQUALS the naive exact groupBy") {
    // the MG candidate pass is pure plan optimization: its survivor set
    // is a guaranteed superset of the heavy hitters, so the recount must
    // reproduce the naive full-shuffle answer exactly
    val got = MiningQueries.q160HeavyHitters(spark, sfDir)
      .select("bigram", "n").collect().map(r => (r.getString(0), r.getLong(1)))
      .toSet
    val bg = Kpis.table(spark, sfDir, "documents")
      .select(tokens(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(shingles(col("toks"), 2)).as("bigram"))
    val total = bg.count()
    val naive = bg.groupBy("bigram").agg(count(lit(1)).as("n"))
      .filter(col("n") * 640 > total)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == naive, s"MG path diverged: only-mg=${got -- naive} " +
      s"only-naive=${naive -- got}")
  }

  test("q155 picks exactly one supplier per part, the min-cost one") {
    val rows = Tpch6Queries.q155MincostSupplier(spark, sfDir).collect()
    val parts = rows.map(_.getAs[Long]("p_partkey"))
    assert(parts.distinct.length == parts.length, "a part appears twice")
    assert(rows.forall(_.getAs[Double]("supply_cost") > 0))
  }

  test("q159 output is capped, sorted, and counts only multi-supplier orders") {
    val rows = Tpch6Queries.q159SoleLateSupplier(spark, sfDir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val waits = rows.map(_.getAs[Long]("numwait"))
    assert(waits.sameElements(waits.sortBy(-_)), "not sorted by numwait desc")
  }

  test("q162 labels are ids of reachable nodes and never exceed the node id") {
    val rows = MiningQueries.q162LabelProp(spark, sfDir).collect()
    val nodes = rows.map(_.getAs[Long]("part")).toSet
    rows.foreach { r =>
      val (node, lab) = (r.getAs[Long]("part"), r.getAs[Long]("community"))
      assert(lab <= node, s"label $lab > node $node (min-propagation broken)")
      assert(nodes.contains(lab), s"label $lab is not a node")
    }
    // community sizes are consistent with the label multiset
    val bySize = rows.groupBy(_.getAs[Long]("community"))
      .view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("community_size") ==
        bySize(r.getAs[Long]("community")))
    }
  }

  test("q163 SQ8 recall certification stays in spec on the fixture") {
    val rows = QuantQueries.q163Sq8Recall(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("recall5") >= 0.6,
        s"probe ${r.getAs[Long]("probe_id")} recall ${r.getAs[Double]("recall5")}")
      assert(r.getAs[Double]("max_abs_cos_err") < 0.05)
    }
  }

  test("native TopKLongPairs equals the window top-k on random data") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // deterministic pseudo-random (group, key, id) rows with DUPLICATE
    // keys inside groups so the tie-break (key DESC, id ASC) is exercised,
    // spread over several partitions so partial aggregation + merge runs
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(5000) { i =>
      (rng.nextInt(37), rng.nextInt(50).toLong, i.toLong)
    }
    val df = rows.toDF("g", "k", "id").repartition(8)
    val got = df.groupBy(col("g"))
      .agg(graft.operators.TopK.topKLongPairs(col("k"), col("id"), 4).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("i", "e")))
      .select(col("g"), (col("i") + 1).as("rk"),
        col("e.key").as("k"), col("e.id").as("id"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    val w = Window.partitionBy(col("g"))
      .orderBy(col("k").desc, col("id").asc)
    val want = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 4)
      .select(col("g"), col("rk"), col("k"), col("id"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want)
  }

  test("q161 directed rules are consistent: confidence*n_ante == n_both") {
    MiningQueries.q161AssocRules(spark, sfDir).collect().foreach { r =>
      val conf = r.getAs[Double]("confidence")
      val nb = r.getAs[Long]("n_both"); val na = r.getAs[Long]("n_ante")
      assert(conf == nb.toDouble / na.toDouble)
      assert(nb >= 3 && nb <= na)
    }
  }
}
