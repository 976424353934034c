package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CorpusStatsQueries, GraphQueries, Kpis, Tpch3Queries}

/** Round-9 second batch: TPC-H Q17/Q15/Q22 shapes (q108/q109/q110),
  * per-group top-k (q113), degree-oriented triangle counting (q111), and
  * corpus statistics — PMI collocations (q112) and the Zipf fit (q115).
  * Each test recomputes the answer sequentially from collected inputs
  * (fixture-scale ground truth) and, where the scale story depends on the
  * plan shape, asserts that too. */
class Round9bSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q108 matches a sequential recompute of the Q17 threshold semantics") {
    val out = Tpch3Queries.q108SmallQtyRevenue(spark, sfDir).collect()
    assert(out.length == 1)
    val brandParts = Kpis.table(spark, sfDir, "part")
      .filter(col("p_brand") === "Brand#23")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val lines = Kpis.table(spark, sfDir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .filter(t => brandParts.contains(t._1))
    val thresh = lines.groupBy(_._1).map { case (pk, ls) =>
      // BigDecimal sum mirrors the exact-decimal convention
      pk -> 0.2 * (ls.map(l => BigDecimal(l._2)).sum.toDouble / ls.length)
    }
    val expect = lines.filter(l => l._2 < thresh(l._1))
      .map(l => BigDecimal(l._3)).sum.toDouble / 7.0
    assert(math.abs(out.head.getAs[Double]("avg_yearly") - expect) < 1e-6,
      s"got ${out.head.getAs[Double]("avg_yearly")}, want $expect")
  }

  test("q109 returns exactly the argmax suppliers of exact quarter revenue") {
    val rows = Tpch3Queries.q109TopSupplier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val revs = Kpis.table(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00"))
        && col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
      .select(col("l_suppkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)").as("rev"))
      .groupBy("l_suppkey")
      .agg(sum(col("rev")).as("total"))
      .collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1)))
    val max = revs.map(_._2).max
    val winners = revs.filter(_._2 == max).map(_._1).sorted
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSeq == winners.toSeq,
      "argmax set mismatch")
    rows.foreach(r => assert(
      math.abs(r.getAs[Double]("total_revenue") - max.doubleValue) < 1e-9))
  }

  test("q110 counts only above-average-balance customers with zero orders") {
    val rows = Tpch3Queries.q110IdleCustomers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val custs = Kpis.table(spark, sfDir, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val pos = custs.filter(_._3 > 0)
    val avg = pos.map(c => BigDecimal(c._3)).sum.toDouble / pos.length
    val withOrders = Kpis.table(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val nations = Kpis.table(spark, sfDir, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val idle = custs.filter(c => c._3 > avg && !withOrders.contains(c._1))
    val expect = idle.groupBy(c => nations(c._2)).map { case (n, cs) =>
      n -> (cs.length.toLong, cs.map(c => BigDecimal(c._3)).sum.toDouble)
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, bal) = expect(r.getAs[String]("n_name"))
      assert(r.getAs[Long]("n_cust") == n)
      assert(math.abs(r.getAs[Double]("total_bal") - bal) < 1e-6)
    }
  }

  test("q111 triangle count matches a brute-force recount of its own graph") {
    val row = GraphQueries.q111Triangles(spark, sfDir).collect().head
    // rebuild the support>=2 edge set sequentially
    val baskets = Kpis.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val support = scala.collection.mutable.Map.empty[(Long, Long), Int]
    baskets.foreach { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        support((parts(i), parts(j))) =
          support.getOrElse((parts(i), parts(j)), 0) + 1
    }
    val edges = support.filter(_._2 >= 2).keys.toArray
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val tri = edges.iterator.map { case (a, b) =>
      (adj(a) & adj(b)).size
    }.sum / 3  // each triangle seen from all 3 edges
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(row.getAs[Long]("n_edges") == edges.length.toLong)
    assert(row.getAs[Long]("n_nodes") == adj.size.toLong)
    assert(row.getAs[Long]("n_wedges") == wedges)
    assert(row.getAs[Long]("n_triangles") == tri.toLong,
      "degree-oriented wedge closure must equal brute-force triangle count")
    assert(row.getAs[Double]("global_cc") == 3.0 * tri / wedges)
  }

  test("q111 plan has no cartesian product and no unoriented self-join blowup") {
    val plan = GraphQueries.q111Triangles(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q112 PMI values match recomputed marginals; support floor holds") {
    val rows = CorpusStatsQueries.q112PmiCollocations(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    val docs = Kpis.table(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    val bigrams = docs.flatMap { t =>
      val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 2) Array.empty[(String, String)]
      else toks.sliding(2).map(a => (a(0), a(1))).toArray
    }
    val cab = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ca = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cb = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = bigrams.length.toLong
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val c = r.getAs[Long]("c_ab")
      assert(c >= 5, "support floor violated")
      assert(c == cab((w1, w2)))
      val pmi = BigDecimal(math.log(c.toDouble * n / (ca(w1) * cb(w2))))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("pmi") - pmi) < 1e-9)
    }
    // rows arrive in descending PMI order (ties broken by words)
    rows.map(_.getAs[Double]("pmi")).sliding(2).foreach {
      case Array(hi, lo) => assert(hi >= lo, "PMI order broken")
      case _ =>
    }
    // and the top collocation genuinely beats chance
    assert(rows.head.getAs[Double]("pmi") > 0.0)
  }

  test("q113 emits at most 3 rows per nation, correctly ranked") {
    val rows = Tpch3Queries.q113TopPartsPerNation(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("n_name")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq ==
        (1 to rs.length).toSeq)
      rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Double]("revenue"))
        .sliding(2).foreach {
          case Array(hi, lo) => assert(hi >= lo, "rank order broken")
          case _ =>
        }
    }
  }

  test("q114 vocabulary overlap matches sequential set intersection") {
    val rows = CorpusStatsQueries.q114LangOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val vocab = Kpis.table(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .flatMap { r =>
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .map(t => (r.getString(0), t))
      }.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val langs = vocab.keys.toArray.sorted
    val expectPairs = for {
      i <- langs.indices; j <- i + 1 until langs.length
      inter = (vocab(langs(i)) & vocab(langs(j))).size if inter > 0
    } yield (langs(i), langs(j))
    assert(rows.map(r => (r.getAs[String]("lang_a"),
      r.getAs[String]("lang_b"))).toSeq == expectPairs)
    rows.foreach { r =>
      val a = vocab(r.getAs[String]("lang_a"))
      val b = vocab(r.getAs[String]("lang_b"))
      val inter = (a & b).size
      assert(r.getAs[Long]("n_a") == a.size.toLong)
      assert(r.getAs[Long]("n_b") == b.size.toLong)
      assert(r.getAs[Long]("n_shared") == inter.toLong)
      assert(r.getAs[Double]("vocab_jaccard") ==
        inter.toDouble / (a.size + b.size - inter))
    }
  }

  test("q116 bloom-pruned decontamination is byte-identical to q48's report") {
    val plain = graft.queries.DecontamQueries.q48Decontam(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val df = graft.queries.DecontamQueries.q116BloomDecontam(spark, sfDir)
    val pruned = df.collect().map(_.toSeq).toSeq
    assert(pruned == plain,
      "bloom must be plan-side only — exact verify guarantees q48's result")
    assert(plain.nonEmpty)
  }

  test("bloom prunedSemiJoin equals a plain semi-join on adversarial keys") {
    import spark.implicits._
    // keys engineered so the bloom sees misses, hits, and duplicates
    val left = (1L to 500L).map(i => (i, s"k${i % 120}")).toDF("id", "s")
    val right = (0L to 29L).map(i => s"k${i * 3}").toDF("s")
    val got = graft.operators.BloomPrune
      .prunedSemiJoin(left, right, "s", 1000L, 8192L)
      .collect().map(_.getAs[Long]("id")).sorted
    val want = left.join(right, Seq("s"), "leftsemi")
      .collect().map(_.getAs[Long]("id")).sorted
    assert(got.toSeq == want.toSeq)
    // and the probe plan really carries the bloom predicate
    val plan = graft.operators.BloomPrune
      .prunedSemiJoin(left, right, "s", 1000L, 8192L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("q117 certifies the GK sketch within its rank bound, exact p50/p90 right") {
    val rows = graft.queries.StatsQueries
      .q117QuantileSketchCert(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = Kpis.eventsTable(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def interp(vs: Array[Double], p: Double): Double = {
      val pos = p * (vs.length - 1)
      val lo = pos.toInt
      if (lo == vs.length - 1) vs(lo)
      else vs(lo) + (pos - lo) * (vs(lo + 1) - vs(lo))
    }
    rows.foreach { r =>
      val vs = byType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == vs.length.toLong)
      assert(math.abs(r.getAs[Double]("p50_exact") - interp(vs, 0.5)) < 1e-9)
      assert(math.abs(r.getAs[Double]("p90_exact") - interp(vs, 0.9)) < 1e-9)
      assert(r.getAs[Int]("p50_sketch_ok") == 1,
        "GK sketch broke its p50 rank guarantee")
      assert(r.getAs[Int]("p90_sketch_ok") == 1,
        "GK sketch broke its p90 rank guarantee")
    }
  }

  test("q118 merged rollup equals the one-shot rollup; merge is associative") {
    import graft.operators.IncrementalRollup
    val rows = IncrementalRollup.q118IncrementalRollup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val oneShot = Kpis.table(spark, sfDir, "orders")
      .select(col("o_custkey"),
        col("o_totalprice").cast("decimal(18,4)").as("v"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("t"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.length == oneShot.size)
    rows.foreach { r =>
      val (n, t) = oneShot(r.getAs[Long]("o_custkey"))
      assert(r.getAs[Long]("n_orders") == n)
      assert(r.getAs[Double]("total_spent") == t,
        "decimal monoid merge must be exact, not approximately equal")
    }
    // associativity: (b1 ⊕ b2) ⊕ b3 = b1 ⊕ (b2 ⊕ b3) on a synthetic split
    import spark.implicits._
    def agg(rows0: Seq[(Long, Double)]) = IncrementalRollup.aggBatch(
      rows0.toDF("k0", "v0"), "k0", "v0")
    val all = (1L to 120L).map(i => (i % 11, i * 1.37))
    val (b1, rest) = all.splitAt(40); val (b2, b3) = rest.splitAt(40)
    val left = IncrementalRollup.merge(
      IncrementalRollup.merge(agg(b1), agg(b2)), agg(b3))
    val right = IncrementalRollup.merge(
      agg(b1), IncrementalRollup.merge(agg(b2), agg(b3)))
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("cnt"),
        r.getDecimal(2).toPlainString)).sortBy(_._1).toSeq
    assert(key(left) == key(right))
  }

  test("q118 store side of the merge is shuffle-free off the bucketed scan") {
    import graft.operators.IncrementalRollup
    val base = java.nio.file.Files.createTempDirectory("graft-incroll-plan")
    val table = "inc_rollup_store_t1"
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    import spark.implicits._
    try {
      val store = IncrementalRollup.aggBatch(
        (1L to 300L).map(i => (i % 40, i * 0.25)).toDF("k0", "v0"),
        "k0", "v0")
      IncrementalRollup.writeStore(store, table, base.resolve("s").toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = IncrementalRollup.aggBatch(
        (1L to 100L).map(i => (i % 55, i * 0.5)).toDF("k0", "v0"),
        "k0", "v0")
      val out = IncrementalRollup.merge(spark.table(table), batch)
      assert(out.count() == 55) // keys 0..39 merged, 40..54 batch-only
      val plan = out.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"expected exactly one Exchange (batch side), got $exchanges in:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS inc_rollup_store_t1")
    }
  }

  test("q119 covariance matches sequential recompute; diagonal is variance") {
    val rows = graft.queries.EmbedStatsQueries
      .q119EmbedCovariance(spark, sfDir).collect()
    assert(rows.length == 64 * 65 / 2)
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(f =>
        BigDecimal(f.toDouble).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
    val n = vecs.length
    def grid6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val check = rows.filter(r => r.getAs[Int]("dim_j") % 17 == 0) // sample
    check.foreach { r =>
      val (i, j) = (r.getAs[Int]("dim_i") - 1, r.getAs[Int]("dim_j") - 1)
      val si = vecs.map(_(i)).sum.toDouble
      val sj = vecs.map(_(j)).sum.toDouble
      val sxy = vecs.map(v => v(i) * v(j)).sum.toDouble
      val cov = sxy / n - (si / n) * (sj / n)
      assert(r.getAs[Long]("n") == n.toLong)
      assert(math.abs(r.getAs[Double]("cov") - grid6(cov)) <= 1e-6,
        s"cov($i,$j)")
      assert(math.abs(r.getAs[Double]("mean_i") - grid6(si / n)) <= 1e-6)
    }
    rows.filter(r => r.getAs[Int]("dim_i") == r.getAs[Int]("dim_j"))
      .foreach(r => assert(r.getAs[Double]("cov") >= 0.0,
        "a variance (diagonal entry) cannot be negative"))
  }

  test("q120 is scan-dominated: every predicate pushed, no join, rows counted") {
    val df = Tpch3Queries.q120ForecastRevenue(spark, sfDir)
    val row = df.collect().head
    assert(row.getAs[Long]("n_lineitems") > 0)
    assert(row.getAs[Double]("revenue_delta") > 0.0)
    val formatted = df.queryExecution.executedPlan.toString
    assert(!formatted.contains("Join"), "Q6 shape must not join")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString("\n")
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(scan.contains(c), s"predicate on $c should reach the scan:\n$scan")
    }
  }

  test("q115 fits a negative Zipf slope per language, matching sequential OLS") {
    val rows = CorpusStatsQueries.q115ZipfFit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val freq = Kpis.table(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .flatMap { r =>
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .map(t => (r.getString(0), t))
      }
      .groupBy(identity).view.mapValues(_.length).toMap
      .groupBy(_._1._1)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      assert(r.getAs[Double]("zipf_slope") < 0.0,
        s"natural text must have negative Zipf slope, lang=$lang")
      val fs = freq(lang).toArray.map { case ((_, t), f) => (t, f) }
        .sortBy { case (t, f) => (-f, t) }
      assert(r.getAs[Long]("n_types") == fs.length.toLong)
      val pts = fs.zipWithIndex.map { case ((_, f), i) =>
        def grid(v: Double) = BigDecimal(v)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        (grid(math.log(i + 1.0)), grid(math.log(f.toDouble)))
      }
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum.toDouble
      val sxx = pts.map(p => p._1 * p._1).sum.toDouble
      val sy = pts.map(_._2).sum.toDouble
      val sxy = pts.map(p => p._1 * p._2).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val expSlope = BigDecimal(slope)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("zipf_slope") - expSlope) <= 1e-6)
    }
  }
}
