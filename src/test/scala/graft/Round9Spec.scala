package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SemanticCells
import graft.queries.{EmbedQueries, Round9Queries}

/** Round-9 additions: TPC-H Q18 shape (q95), host stats (q96), vocab
  * coverage (q97), MinHash band-store near-dedup (q98), and cell-based
  * semantic dedup (q99). */
class Round9Spec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q95 keeps only >200-quantity orders, value-ordered, agg before join") {
    val df = Round9Queries.q95BigOrders(spark, sfDir)
    val rows = df.collect()
    rows.foreach(r => assert(r.getAs[Double]("sum_qty") > 200.0))
    rows.map(_.getAs[Double]("o_totalprice")).sliding(2).foreach {
      case Array(hi, lo) => assert(hi >= lo, "value order broken")
      case _ =>
    }
    // the HAVING filter must prune BEFORE the joins: the plan aggregates
    // lineitem then filters, with no join below the aggregate
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate"), plan)
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"), "top-100 must not global-sort")
  }

  test("q100 ship-date window is pushed; nation pairs are exhaustive for data") {
    val df = Round9Queries.q100NationVolume(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val y = r.getAs[Int]("l_year")
      assert(y == 1995 || y == 1996, s"year outside the window: $y")
      assert(r.getAs[Double]("revenue") > 0)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"ship-date window not pushed:\n$plan")
    assert(!plan.contains("CartesianProduct"), "no cross products")
  }

  test("q96 host extraction recovers source x tld exactly; shares sum to 1") {
    val rows = Round9Queries.q96HostStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[String]("host")
      assert(h.matches("src\\d+\\.example\\.(com|org|net)"), s"bad host $h")
    }
    val total = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(total - 1.0) < 1e-9, s"shares sum to $total")
  }

  test("q97 coverage is monotone, rank-ordered, bounded by 1") {
    val rows = Round9Queries.q97VocabCoverage(spark, sfDir).collect()
    assert(rows.length <= 50 && rows.nonEmpty)
    var prevCum = 0.0
    var prevCnt = Long.MaxValue
    rows.foreach { r =>
      val cnt = r.getAs[Long]("cnt")
      val cum = r.getAs[Double]("cum_share")
      assert(cnt <= prevCnt, "counts must be non-increasing by rank")
      assert(cum > prevCum && cum <= 1.0, s"cum_share not monotone: $cum")
      prevCum = cum; prevCnt = cnt
    }
  }

  test("q98 flags near-clones against the band store, never novel docs") {
    val rows = Round9Queries.q98MinhashStoreDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("a_id")
      val b = r.getAs[Long]("b_id")
      assert(a < 1000000000000L, s"store side must be a corpus doc: $a")
      // token-remapped novel docs (+2e12) have disjoint shingles — any
      // band collision must die in the exact-Jaccard verify
      assert(b >= 1000000000000L && b < 2000000000000L,
        s"only near-clone batch docs may flag, got $b")
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
    // every near-clone flags against its own original
    val flagged = rows.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val selfPairs = flagged.count { case (a, b) => b - 1000000000000L == a }
    assert(selfPairs > 0, "near-clones must flag their originals")
  }

  test("q99 cells edge set is q50's restricted within cells; reps are minima") {
    val cells = SemanticCells.q99SemanticCells(spark, sfDir).collect()
    if (cells.nonEmpty) {
      cells.foreach { r =>
        assert(r.getAs[Long]("cluster_id") <= r.getAs[Long]("vec_id"),
          "cluster id must be the min member")
      }
      val reps = cells.filter(_.getAs[Int]("is_rep") == 1)
        .map(_.getAs[Long]("vec_id")).toSet
      assert(reps == cells.map(_.getAs[Long]("cluster_id")).toSet)
    }
    // recall containment: every q99 clustered vector is q50-clustered too
    // (within-cell edges are a subset of the full banded edge set)
    val q50Vecs = EmbedQueries.q50SemanticDedup(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val q99Vecs = cells.map(_.getAs[Long]("vec_id")).toSet
    assert(q99Vecs.subsetOf(q50Vecs),
      s"q99 found vectors q50 didn't: ${q99Vecs.diff(q50Vecs)}")
  }

  test("q102 digests flag exactly the perturbed buckets, none clean") {
    val rows = Round9Queries.q102PartitionDigest(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the perturbation touches keys %997==0 (dropped) and %1000==0
    // (re-priced): a flagged bucket must contain at least one such key,
    // and every such key's bucket must be flagged
    val flagged = rows.map(_.getAs[Long]("bucket").toInt).toSet
    val keys = spark.read.parquet(s"${SparkTestSession.sfDir}/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0))
    val dirtyBuckets = keys
      .filter(k => k % 997 == 0 || k % 1000 == 0)
      .map(k => (k % 64).toInt).toSet
    assert(flagged == dirtyBuckets,
      s"flagged $flagged but perturbed buckets are $dirtyBuckets")
    // count mismatch only where rows were dropped; digest differs everywhere flagged
    rows.foreach { r =>
      assert(r.getAs[Long]("a_cnt") >= r.getAs[Long]("b_cnt"))
    }
  }

  test("q103 transition probabilities are a proper distribution per source") {
    val rows = Round9Queries.q103EventTransitions(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getAs[String]("cur_type"))
    bySrc.foreach { case (src, trs) =>
      val total = trs.map(_.getAs[Double]("p_next")).sum
      assert(math.abs(total - 1.0) < 1e-9,
        s"$src: probabilities sum to $total")
      trs.foreach(r => assert(r.getAs[Double]("p_next") > 0.0))
    }
    // 5 event types -> at most 25 cells
    assert(rows.length <= 25)
  }

  test("q104 bands partition matched rows; unmatched brands never appear") {
    val rows = Round9Queries.q104BrandBands(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bands = rows.map(_.getAs[String]("band")).toSet
    assert(bands.subsetOf(Set("band_small", "band_mid", "band_large")))
    rows.foreach { r =>
      assert(r.getAs[Double]("revenue") > 0)
      assert(r.getAs[Long]("n_items") > 0)
    }
  }

  test("q105 flags only |z| >= 2 days; z matches a sequential recompute") {
    val rows = Round9Queries.q105RevenueAnomalies(spark, sfDir).collect()
    rows.foreach(r => assert(math.abs(r.getAs[Double]("z")) >= 2.0))
    // sequential ground truth over the same daily sums
    val daily = spark.read
      .parquet(s"${SparkTestSession.sfDir}/lineitem.parquet")
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("rev"))
      .collect().map(_.getAs[Double]("rev"))
    val n = daily.length.toDouble
    val mean = daily.sum / n
    val variance = daily.map(x => (x - mean) * (x - mean)).sum / n
    val expected = daily.count(x => math.abs((x - mean) / math.sqrt(variance)) >= 2.0)
    assert(rows.length == expected,
      s"flagged ${rows.length} days, sequential model says $expected")
  }

  test("q106 audits all six FK edges; the fixture is referentially clean") {
    val rows = Round9Queries.q106FkAudit(spark, sfDir).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_children") > 0)
      assert(r.getAs[Long]("n_orphans") == 0L,
        s"${r.getAs[String]("fk_edge")} has orphans")
    }
  }

  test("q107 rolling window bounds weekly count and a sequential recompute") {
    val rows = Round9Queries.q107RollingWau(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("rolling_4wk_users") >=
        r.getAs[Long]("weekly_users"),
        "rolling window cannot have fewer users than its newest week")
    }
    // sequential ground truth: distinct users over weeks [w-3, w]
    val pres = queries.Kpis.eventsTable(spark, SparkTestSession.sfDir)
      .select(col("user_id"),
        floor(datediff(col("ts").cast("date"),
          lit("2024-01-01").cast("date")) / 7).cast("long").as("wk"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byWeek = pres.groupBy(_._2)
    rows.foreach { r =>
      val w = r.getAs[Long]("week_idx")
      val expected = pres
        .filter { case (_, pw) => pw >= w - 3 && pw <= w }
        .map(_._1).distinct.length
      assert(r.getAs[Long]("rolling_4wk_users") == expected,
        s"week $w rolling mismatch")
      assert(r.getAs[Long]("weekly_users") ==
        byWeek(w).map(_._1).distinct.length)
    }
  }

  test("q101 multi-probe recall sits between q99's and q50's") {
    val q99Vecs = SemanticCells.q99SemanticCells(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val q101Vecs = SemanticCells.q101SemanticCellsMp(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val q50Vecs = EmbedQueries.q50SemanticDedup(spark, sfDir).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    // probe 1 of assignTop IS the single-probe cell, so q99's edges are a
    // subset of q101's; both are within-cell restrictions of q50's
    assert(q99Vecs.subsetOf(q101Vecs),
      s"multi-probe lost single-probe vectors: ${q99Vecs.diff(q101Vecs)}")
    assert(q101Vecs.subsetOf(q50Vecs),
      s"q101 found vectors q50 didn't: ${q101Vecs.diff(q50Vecs)}")
  }
}
