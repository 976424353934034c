package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-12i queries (q289–). */
class Round12hSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q289: every surviving order exceeds the threshold exactly once") {
    val rows = queries.Tpch7Queries.q289LargeOrders(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(_.getAs[Long]("o_orderkey"))
    assert(keys.distinct.length == keys.length, "orderkey emitted twice")
    rows.foreach { r =>
      assert(r.getAs[Double]("total_qty") > 250.0,
        s"order ${r.getAs[Long]("o_orderkey")} under threshold")
    }
    // descending by total_qty (ties broken by orderkey): the emitted order
    val qtys = rows.map(_.getAs[Double]("total_qty"))
    assert(qtys.zip(qtys.tail).forall { case (a, b) => a >= b })
  }

  test("q289: survivor set matches an independent recount") {
    import org.apache.spark.sql.functions._
    val expected = queries.Kpis.table(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey")).agg(sum("l_quantity").as("s"))
      .filter(col("s") > 250.0).count()
    val got = queries.Tpch7Queries.q289LargeOrders(spark, sfDir).count()
    assert(got == expected, s"$got vs $expected")
  }

  test("q291: AUC in [0,1], Gini = 2·AUC−1, KS in [0,1], pair identity") {
    val r = queries.ExperimentQueries.q291ScoreDiscrimination(spark, sfDir)
      .collect()
    assert(r.length == 1)
    val row = r.head
    val nPos = row.getAs[Long]("n_pos")
    val nNeg = row.getAs[Long]("n_neg")
    val u2 = row.getAs[Long]("u_times2")
    val auc = row.getAs[Double]("auc")
    val gini = row.getAs[Double]("gini")
    val ks = row.getAs[Double]("ks_stat")
    assert(nPos > 0 && nNeg > 0)
    // 2U counts each of the n+·n- pairs 0, 1, or 2 (ties once each)
    assert(u2 >= 0 && u2 <= 2 * nPos * nNeg)
    assert(auc >= 0.0 && auc <= 1.0)
    assert(math.abs(gini - (2 * auc - 1)) < 1e-12)
    assert(ks >= 0.0 && ks <= 1.0)
    // NOT asserted: auc > 0.5 — whether the score discriminates is a
    // property of the synthetic fixture (it doesn't at sf0.001), not of
    // the operator; the math identities above are the invariants.
  }

  test("q291: AUC agrees with a brute-force pair count on a slice") {
    import org.apache.spark.sql.functions._
    // independent recount on the same (x, y) construction
    val act = queries.Kpis.table(spark, sfDir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").between(1995, 2000))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("yr") <= 1997, 1L).otherwise(0L)).as("x0"),
        max(when(col("yr") >= 1998, 1L).otherwise(0L)).as("y0"))
    val xy = queries.Kpis.table(spark, sfDir, "customer")
      .select(col("c_custkey"))
      .join(act, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("x0"), lit(0L)).as("x"),
        coalesce(col("y0"), lit(0L)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pos = xy.filter(_._2 == 1L).map(_._1)
    val neg = xy.filter(_._2 == 0L).map(_._1)
    val u2Brute = pos.iterator.map { p =>
      neg.count(_ < p).toLong * 2 + neg.count(_ == p).toLong
    }.sum
    val row = queries.ExperimentQueries
      .q291ScoreDiscrimination(spark, sfDir).collect().head
    assert(row.getAs[Long]("u_times2") == u2Brute)
    assert(row.getAs[Long]("n_pos") == pos.length.toLong)
    assert(row.getAs[Long]("n_neg") == neg.length.toLong)
  }

  test("q292: census user total matches active users; lengths positive") {
    import org.apache.spark.sql.functions._
    val rows = queries.SessionQueries.q292ActivityStreaks(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("longest_streak") >= 1))
    val total = rows.map(_.getAs[Long]("n_users")).sum
    val users = queries.Kpis.eventsTable(spark, sfDir)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(total == users, s"census covers $total of $users users")
  }

  test("q293: limits symmetric around center; flags match the limits") {
    val rows = queries.SeriesQueries.q293ImrChart(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = r.getAs[Long]("n_orders").toDouble
      val ucl = r.getAs[Double]("ucl")
      val lcl = r.getAs[Double]("lcl")
      assert(ucl > lcl)
      val expected = x > ucl || x < lcl
      assert(r.getAs[Boolean]("out_of_control") == expected)
      assert(r.getAs[Long]("moving_range") >= 0)
    }
    // one shared pair of limits across the whole chart
    assert(rows.map(_.getAs[Double]("ucl")).distinct.length == 1)
  }

  test("q294: peel ledger is monotone non-increasing and converged") {
    val rows = queries.GraphQueries.q294CorePeel(spark, sfDir).collect()
    assert(rows.length == 7)
    val byRound = rows.sortBy(_.getAs[Long]("round"))
      .map(_.getAs[Long]("n_nodes"))
    byRound.zip(byRound.tail).foreach { case (a, b) =>
      assert(b <= a, s"peel grew: $a -> $b")
    }
    assert(byRound(5) == byRound(6),
      s"6 rounds did not reach the 3-core fixpoint at fixture scale: " +
        byRound.mkString(","))
  }

  test("jaro_winkler: canonical examples, DuckDB edge semantics, bounds") {
    import org.apache.spark.sql.graft.JaroWinklerImpl
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String): Double = JaroWinklerImpl.jw(u(a), u(b))
    // classic literature examples (also DuckDB's values)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    // boost threshold: jaro <= 0.7 gets NO prefix boost despite prefix "AB"
    assert(math.abs(jw("ABCDEF", "ABXXXX") - 0.5555555555555555) < 1e-15)
    // prefix cap at 4
    assert(math.abs(jw("PREFIX", "PREFIXTAIL") - 0.92) < 1e-15)
    // DuckDB scores empty-vs-empty 0, unlike the classic convention
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0 && jw("", "a") == 0.0)
    assert(jw("same", "same") == 1.0)
    // symmetry + bounds on a small grid
    val words = Seq("small ring", "red widget", "blue bolt", "hot gear",
      "small gizmo", "old bolt", "red bolt", "ab", "ba", "abc")
    for (a <- words; b <- words) {
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0)
      assert(v == jw(b, a), s"asymmetric on ($a, $b)")
      if (a == b) assert(v == 1.0)
    }
  }

  test("jaro_winkler: codegen path equals interpreted eval and SQL registry works") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.jaroWinkler
    val df = queries.Kpis.table(spark, sfDir, "part")
      .select(col("p_name")).distinct().limit(40)
      .withColumnRenamed("p_name", "a")
      .crossJoin(queries.Kpis.table(spark, sfDir, "part")
        .select(col("p_name").as("b")).distinct().limit(40))
    // whole-stage codegen on (default) vs off → identical doubles
    val on = df.select(jaroWinkler(col("a"), col("b")).as("v")).collect()
      .map(_.getDouble(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val off =
      try df.select(jaroWinkler(col("a"), col("b")).as("v")).collect()
        .map(_.getDouble(0))
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(on.sameElements(off))
    // SQL registration via GraftExtensions
    val viaSql = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS v").collect().head
      .getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-15)
  }

  test("q296: 10 ranked rows, nDCG in (0,1], IDCG dominates DCG, gains consistent") {
    val rows = queries.RankQueries.q296NdcgAt10(spark, sfDir).collect()
    assert(rows.length == 10)
    val ranks = rows.map(_.getAs[Long]("rank")).sorted
    assert(ranks.sameElements(1L to 10L))
    val dcg = rows.head.getAs[Double]("dcg")
    val idcg = rows.head.getAs[Double]("idcg")
    val ndcg = rows.head.getAs[Double]("ndcg")
    assert(idcg >= dcg - 1e-9, s"IDCG $idcg < DCG $dcg")
    assert(ndcg > 0.0 && ndcg <= 1.0 + 1e-12)
    assert(math.abs(ndcg - dcg / idcg) < 1e-12)
    // gain at rank 1 is the grade itself (weight 1.0)
    val r1 = rows.find(_.getAs[Long]("rank") == 1L).get
    assert(r1.getAs[Double]("gain") ==
      r1.getAs[Long]("rel_grade").toDouble)
    // bm25 ordering is descending across the emitted positions
    val byRank = rows.sortBy(_.getAs[Long]("rank"))
      .map(_.getAs[Double]("bm25"))
    byRank.zip(byRank.tail).foreach { case (a, b) => assert(a >= b) }
  }

  test("q297: HRW moves far fewer docs than mod-N; shares consistent") {
    val r = queries.ShardQueries.q297ShardStability(spark, sfDir)
      .collect()
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_docs")
    val modMoved = row.getAs[Long]("mod_moved")
    val hrwMoved = row.getAs[Long]("hrw_moved")
    assert(n > 0)
    assert(row.getAs[Double]("mod_share") == modMoved.toDouble / n)
    assert(row.getAs[Double]("hrw_share") == hrwMoved.toDouble / n)
    // theory: mod-N moves ~N/(N+1)=89%, HRW ~1/(N+1)=11% — allow wide
    // tolerance, but the ORDERING must hold decisively
    assert(hrwMoved * 4 < modMoved,
      s"HRW ($hrwMoved) should move <<25% of mod-N ($modMoved)")
    assert(row.getAs[Double]("hrw_share") < 0.25 &&
      row.getAs[Double]("mod_share") > 0.5)
  }

  test("q298: Chao1 dominates observed vocabulary; coverage consistent") {
    val r = queries.CorpusStatsQueries.q298Chao1Vocab(spark, sfDir)
      .collect()
    assert(r.length == 1)
    val row = r.head
    val d = row.getAs[Long]("d_observed")
    val f1 = row.getAs[Long]("f1")
    val f2 = row.getAs[Long]("f2")
    val est = row.getAs[Double]("chao1_est")
    assert(d > 0 && f1 >= 0 && f2 >= 0 && f1 + f2 <= d)
    assert(est >= d.toDouble, s"Chao1 $est below observed $d")
    assert(math.abs(est - (d.toDouble +
      (f1 * (f1 - 1)).toDouble / (2 * (f2 + 1)).toDouble)) < 1e-9)
    val cov = row.getAs[Double]("coverage")
    assert(cov > 0.0 && cov <= 1.0)
  }

  test("q299: bloom cert identities and occupancy-prediction agreement") {
    val r = queries.EstimateQueries.q299BloomFprCert(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val m = row.getAs[Long]("m_bits")
    val nMem = row.getAs[Long]("n_member")
    val nProbe = row.getAs[Long]("n_probe")
    val bits = row.getAs[Long]("bits_set")
    val fp = row.getAs[Long]("fp_count")
    val load = row.getAs[Double]("load_factor")
    val exp = row.getAs[Double]("expected_fp_rate")
    val rate = row.getAs[Double]("fp_rate")
    assert(m == 8192L && nMem > 0 && nProbe > 0)
    assert(bits <= 3 * nMem && bits <= m)
    assert(load == bits.toDouble / m)
    assert(exp == load * load * load)
    assert(rate == fp.toDouble / nProbe)
    // measured FPR within binomial noise of the occupancy prediction:
    // |rate − p³| ≤ 5·σ + 1/n (σ = sqrt(p³(1−p³)/n))
    val sigma = math.sqrt(exp * (1 - exp) / nProbe)
    assert(math.abs(rate - exp) <= 5 * sigma + 1.0 / nProbe,
      s"measured $rate vs predicted $exp (σ=$sigma)")
  }

  test("q300: strengths in [0,1], variances positive, seasonal components near-centered") {
    val rows = queries.SeriesQueries
      .q300DecompositionStrength(spark, sfDir).collect()
    assert(rows.length == 7)
    assert(rows.map(_.getAs[Long]("wd")).sorted.sameElements(0L to 6L))
    val r = rows.head
    val fT = r.getAs[Double]("f_trend")
    val fS = r.getAs[Double]("f_seasonal")
    assert(fT >= 0.0 && fT <= 1.0)
    assert(fS >= 0.0 && fS <= 1.0)
    assert(r.getAs[Double]("var_resid") > 0.0)
    assert(r.getAs[Double]("var_deseason_target") > 0.0)
    assert(r.getAs[Double]("var_detrend_target") > 0.0)
    // removing a component can only explain variance: Var(R) ≤ Var(x−T)
    assert(r.getAs[Double]("var_resid") <=
      r.getAs[Double]("var_deseason_target") + 1e-6)
    // weekday means of the detrended series sum to ~0 (each is a mean
    // of a near-partition of a near-zero-mean series; 4-dp snapping and
    // unequal weekday counts leave only a small imbalance)
    val sSum = rows.map(_.getAs[Double]("seasonal")).sum
    val scale = rows.map(r0 => math.abs(r0.getAs[Double]("seasonal"))).max
    assert(math.abs(sSum) <= math.max(7 * 0.0001, scale),
      s"seasonal components sum $sSum vs scale $scale")
  }

  test("q301: one peak per nation; trailing window dominates the peak day itself") {
    import org.apache.spark.sql.functions._
    val rows = queries.SeriesQueries
      .q301PeakTrailingWindow(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nations = rows.map(_.getAs[String]("nation"))
    assert(nations.distinct.length == nations.length)
    rows.foreach { r =>
      val win = r.getAs[Long]("days_in_window")
      assert(win >= 1 && win <= 30)
      assert(r.getAs[Long]("peak_window_cents") > 0)
    }
    // cross-check one nation against a brute-force recount
    val n0 = nations.min
    val daily = queries.Kpis.table(spark, sfDir, "orders")
      .join(queries.Kpis.table(spark, sfDir, "customer")
        .join(queries.Kpis.table(spark, sfDir, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === n0)
        .select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
    val brute = daily.map { case (ed, _) =>
      daily.filter { case (e2, _) => e2 <= ed && e2 >= ed - 29 }
        .map(_._2).sum
    }.max
    val got = rows.find(_.getAs[String]("nation") == n0).get
      .getAs[Long]("peak_window_cents")
    assert(got == brute, s"$n0: $got vs brute $brute")
  }

  test("q302: median/MAD ledger identities and robust-flag consistency") {
    val r = queries.StatsQueries.q302MadOutliers(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_days")
    val med = row.getAs[Long]("median_daily")
    val mad = row.getAs[Long]("mad")
    val thr = row.getAs[Double]("threshold")
    val out = row.getAs[Long]("n_outliers")
    val maxDev = row.getAs[Long]("max_abs_dev")
    assert(n > 0 && med > 0 && mad >= 0)
    assert(thr == mad.toDouble * 4.4478)
    assert(out >= 0 && out <= n)
    // at least half the days lie within one MAD of the median, by the
    // defining property of the (lower) median of absolute deviations
    assert(maxDev >= mad)
    if (maxDev.toDouble <= thr) assert(out == 0)
    else assert(out >= 1)
  }

  test("q303: pattern census closes; entropy within [0, ln 6]; shares consistent") {
    val rows = queries.SeriesQueries
      .q303PermutationEntropy(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val pats = rows.map(_.getAs[String]("pattern"))
    assert(pats.toSet.subsetOf(
      Set("123", "132", "213", "231", "312", "321")))
    val n = rows.head.getAs[Long]("n_windows")
    assert(rows.map(_.getAs[Long]("n_triples")).sum == n)
    val pe = rows.head.getAs[Double]("pe_nats")
    assert(pe >= 0.0 && pe <= math.log(6.0) + 1e-6)
    val norm = rows.head.getAs[Double]("pe_normalized")
    assert(math.abs(norm - pe / 1.791759469) < 1e-12)
    val top = rows.map(_.getAs[Long]("n_triples")).max
    assert(rows.head.getAs[Double]("dominant_share") == top.toDouble / n)
  }

  test("q304: index identities — Fisher is the geometric mean, all positive") {
    val r = queries.MarketQueries.q304PriceIndices(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val l = row.getAs[Double]("laspeyres")
    val p = row.getAs[Double]("paasche")
    val f = row.getAs[Double]("fisher")
    assert(row.getAs[Long]("n_parts") > 0)
    assert(l > 0 && p > 0 && f > 0)
    assert(f == math.sqrt(l * p))
    // Fisher lies between its two factor indices
    assert(f >= math.min(l, p) - 1e-12 && f <= math.max(l, p) + 1e-12)
  }

  test("q305: periods in 1..12, fiscal-year shares close to 1, orders conserved") {
    val rows = queries.MarketQueries.q305Fiscal445(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("period")
      assert(p >= 1 && p <= 12, s"period $p out of the 4-4-5 grid")
      assert(r.getAs[Long]("n_orders") > 0)
    }
    rows.groupBy(_.getAs[Long]("fy")).foreach { case (fy, g) =>
      val share = g.map(_.getAs[Double]("fy_share")).sum
      assert(math.abs(share - 1.0) < 1e-9, s"FY$fy shares sum to $share")
    }
    val totalOrders = rows.map(_.getAs[Long]("n_orders")).sum
    val expected = queries.Kpis.table(spark, sfDir, "orders").count()
    assert(totalOrders == expected)
  }

  test("q306: 3x3 grid closes; revenue shares sum to 1; ABC dominance order") {
    val rows = queries.MarketQueries.q306AbcXyz(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val share = rows.map(_.getAs[Double]("revenue_share")).sum
    assert(math.abs(share - 1.0) < 1e-9, s"shares sum to $share")
    val byAbc = rows.groupBy(_.getAs[String]("abc_class"))
      .view.mapValues(_.map(_.getAs[Double]("revenue_share")).sum).toMap
    // the 80/95 cuts mean A-revenue >= B-revenue >= C-revenue
    assert(byAbc.getOrElse("A", 0.0) >= byAbc.getOrElse("B", 0.0))
    assert(byAbc.getOrElse("B", 0.0) >= byAbc.getOrElse("C", 0.0))
    // terciles balance part counts within ±1 per tier
    val byXyz = rows.groupBy(_.getAs[String]("xyz_class"))
      .view.mapValues(_.map(_.getAs[Long]("n_parts")).sum).toMap
    val counts = byXyz.values.toSeq
    assert(counts.max - counts.min <= 1,
      s"terciles unbalanced: $byXyz")
  }

  test("q307: water-filling ledger — feasibility, budget closure, cap stability") {
    val rows = queries.SplitQueries.q307WaterFilling(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val t = rows.head.getAs[Long]("target_budget")
    val un = rows.head.getAs[Long]("unallocated")
    var allocSum = 0L
    rows.foreach { r =>
      val a = r.getAs[Long]("available")
      val alloc = r.getAs[Long]("allocated")
      assert(alloc >= 0 && alloc <= a, s"${r.getAs[String]("source")}")
      if (r.getAs[Boolean]("capped")) assert(alloc == a)
      allocSum += alloc
    }
    // budget closes exactly: allocated + unallocated remainder = target
    assert(allocSum + un == t, s"$allocSum + $un != $t")
    assert(un >= 0 && un < rows.length.toLong * 2,
      s"remainder $un exceeds the floor-division slack bound")
    // convergence: re-running one more round caps nothing new — every
    // uncapped source's allocation is strictly under its availability
    rows.filter(!_.getAs[Boolean]("capped")).foreach { r =>
      assert(r.getAs[Long]("allocated") < r.getAs[Long]("available"))
    }
  }

  test("q308: 20 ranked merges, descending counts, marker pairs counted once per word") {
    import org.apache.spark.sql.functions._
    val rows = queries.LmQueries.q308BpeFirstMerges(spark, sfDir).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Long]("merge_rank")).sorted
      .sameElements(1L to 20L))
    val counts = rows.sortBy(_.getAs[Long]("merge_rank"))
      .map(_.getAs[Long]("pair_count"))
    counts.zip(counts.tail).foreach { case (a, b) => assert(a >= b) }
    rows.foreach { r =>
      assert(r.getAs[String]("left_sym").length == 1)
      val b = r.getAs[String]("right_sym")
      assert(b.length == 1 || b == "</w>")
    }
    // no pair can outnumber the corpus' token occurrences (each token
    // contributes one marker pair and word-length-1 inner pairs, but a
    // SPECIFIC pair at most once per adjacent position; the top-1 count
    // is far below the token total on natural text)
    val totalToks = queries.Kpis.table(spark, sfDir, "documents")
      .select(explode(graft.functions.TextFunctions
        .tokens(lower(col("text")))).as("w"))
      .count()
    assert(counts.head <= totalToks * 2,
      s"top pair ${counts.head} vs $totalToks tokens")
  }

  test("q309: five checks; pass flags consistent with metric vs threshold") {
    val rows = queries.QualityQueries.q309DqScorecard(spark, sfDir).collect()
    assert(rows.length == 5)
    val names = rows.map(_.getAs[String]("check_name")).toSet
    assert(names == Set("fk_orphan_lineitems", "null_order_keys",
      "exact_dup_docs", "cents_heaping_max_share", "daily_volume_outliers"))
    rows.foreach { r =>
      val m = r.getAs[Double]("metric")
      val t = r.getAs[Double]("threshold")
      assert(m >= 0.0 && m <= 1.0)
      assert(r.getAs[Boolean]("pass") == (m <= t))
      assert(r.getAs[Long]("n_basis") > 0)
    }
    // the q302 reuse: the outlier row's basis equals q302's n_days
    val q302 = queries.StatsQueries.q302MadOutliers(spark, sfDir)
      .collect().head
    val outlierRow = rows
      .find(_.getAs[String]("check_name") == "daily_volume_outliers").get
    assert(outlierRow.getAs[Long]("n_basis") == q302.getAs[Long]("n_days"))
  }

  test("q310: factors >= 1, cohort counts non-increasing in lag, triangle closure") {
    val rows = queries.FunnelQueries.q310ChainLadder(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("lag"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // cum is non-decreasing per cohort, so every aggregate factor >= 1
      assert(r.getAs[Double]("dev_factor") >= 1.0 - 1e-12)
      assert(r.getAs[Long]("sum_cum") > 0)
      assert(r.getAs[Long]("sum_cum_next") >= r.getAs[Long]("sum_cum"))
    }
    // the triangle narrows: older lags are observed by fewer-or-equal cohorts
    val ns = rows.map(_.getAs[Long]("n_cohorts"))
    ns.zip(ns.tail).foreach { case (a, b) => assert(b <= a) }
    // lag axis is a contiguous 0..max prefix
    val lags = rows.map(_.getAs[Long]("lag"))
    assert(lags.sameElements(lags.indices.map(_.toLong)))
  }

  test("q311: k/l audit — shares close, bands partition customers, l bounds") {
    val rows = queries.ScrubQueries.q311KAnonymity(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val totalShare = rows.map(_.getAs[Double]("customer_share")).sum
    assert(math.abs(totalShare - 1.0) < 1e-9)
    val custTotal = queries.Kpis.table(spark, sfDir, "customer").count()
    assert(rows.map(_.getAs[Long]("n_customers_band")).sum == custTotal)
    rows.foreach { r =>
      val minL = r.getAs[Long]("min_l")
      assert(minL >= 1 && minL <= 5) // 5 market segments exist
      val rs = r.getAs[Double]("reidentifiable_share")
      assert(rs >= 0.0 && rs <= 1.0)
      val lds = r.getAs[Double]("low_diversity_group_share")
      assert(lds >= 0.0 && lds <= 1.0)
    }
    // reidentifiable share equals the mass of the k<5 bands
    val smallMass = rows.filter { r =>
      val b = r.getAs[String]("k_band"); b.startsWith("1_") || b.startsWith("2_")
    }.map(_.getAs[Long]("n_customers_band")).sum
    assert(rows.head.getAs[Double]("reidentifiable_share") ==
      smallMass.toDouble / custTotal)
  }

  test("q312: removal effects nonnegative, shares normalize, removal only hurts") {
    val rows = queries.SessionQueries.q312MarkovAttribution(spark, sfDir)
      .collect()
    assert(rows.length == 4)
    val pFull = rows.head.getAs[Double]("p_full")
    assert(pFull > 0.0 && pFull <= 1.0)
    rows.foreach { r =>
      val pr = r.getAs[Double]("p_removed")
      assert(pr >= 0.0 && pr <= pFull + 1e-12,
        s"${r.getAs[String]("channel")}: removal increased conversion")
      assert(r.getAs[Double]("removal_effect") >= 0.0)
      assert(r.getAs[Double]("p_full") == pFull)
    }
    val shares = rows.map(_.getAs[Double]("attribution_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9, s"shares sum ${shares.sum}")
    shares.foreach(s => assert(s >= 0.0 && s <= 1.0))
  }

  test("q313: pair partition closes; ratios consistent with pooled sums") {
    import org.apache.spark.sql.functions._
    val r = queries.MarketQueries.q313PriceDropStudy(spark, sfDir)
      .collect()
    assert(r.length == 1)
    val row = r.head
    val ne = row.getAs[Long]("n_event_pairs")
    val nc = row.getAs[Long]("n_control_pairs")
    assert(ne > 0 && nc > 0)
    // every consecutive-month pair is either event or control
    val pairsTotal = queries.Kpis.table(spark, sfDir, "lineitem")
      .groupBy(col("l_partkey"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("long").as("idx"))
      .agg(count(lit(1)).as("c"))
      .select(col("l_partkey"), col("idx"),
        lead(col("idx"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_partkey")).orderBy(col("idx"))).as("nxt"))
      .filter(col("nxt") === col("idx") + 1)
      .count()
    assert(ne + nc == pairsTotal, s"$ne + $nc != $pairsTotal")
    assert(row.getAs[Double]("event_ratio") ==
      row.getAs[Long]("event_after").toDouble /
        row.getAs[Long]("event_before"))
    assert(row.getAs[Double]("relative_uplift") ==
      row.getAs[Double]("event_ratio") / row.getAs[Double]("control_ratio"))
  }

  test("q314: SRM counts close; z consistent; healthy hash split unflagged") {
    val r = queries.ExperimentQueries.q314SrmCheck(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n")
    val na = row.getAs[Long]("n_a")
    assert(na + row.getAs[Long]("n_b") == n)
    val z = row.getAs[Double]("srm_z")
    assert(z == (na.toDouble - n * 0.5) / math.sqrt(n * 0.25))
    assert(row.getAs[Boolean]("srm_flag") == (math.abs(z) > 3.0))
    // md5 assignment is sound: a healthy split must not trip SRM
    assert(!row.getAs[Boolean]("srm_flag"), s"hash split flagged, z=$z")
  }

  test("q315: CUPED identities — rho² in [0,1], adjusted variance consistent") {
    val r = queries.ExperimentQueries.q315CupedReduction(spark, sfDir)
      .collect()
    assert(r.length == 1)
    val row = r.head
    val rho2 = row.getAs[Double]("rho_sq")
    val varPost = row.getAs[Double]("var_post")
    val varAdj = row.getAs[Double]("var_adjusted")
    assert(rho2 >= 0.0 && rho2 <= 1.0)
    assert(varPost > 0.0)
    assert(varAdj == varPost * (1.0 - rho2))
    assert(varAdj <= varPost)
  }

  test("q316: four looks, enrollment monotone, boundaries decrease, flags consistent") {
    val rows = queries.ExperimentQueries.q316SequentialLooks(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("look"))
    assert(rows.length == 4)
    val enrolled = rows.map(_.getAs[Long]("n_enrolled"))
    enrolled.zip(enrolled.tail).foreach { case (a, b) =>
      assert(b >= a, "enrollment shrank between looks")
    }
    val bounds = rows.map(_.getAs[Double]("obf_boundary"))
    assert(bounds.sameElements(Seq(4.048, 2.862, 2.337, 2.024)))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("stop") ==
        (math.abs(r.getAs[Double]("z")) > r.getAs[Double]("obf_boundary")))
    }
    // final look's z equals q129's z over the same assignment only when
    // enrollment covers all users — at look 4 every user has enrolled
    assert(enrolled.last ==
      queries.Kpis.eventsTable(spark, sfDir)
        .select(org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.col("user_id")))
        .collect().head.getLong(0))
  }

  test("q317: coherence gap identity; BU sums nation medians; errors consistent") {
    val r = queries.SeriesQueries.q317HierForecast(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val td = row.getAs[Long]("f_top_down")
    val bu = row.getAs[Long]("f_bottom_up")
    val actual = row.getAs[Long]("actual")
    assert(row.getAs[Long]("coherence_gap") == td - bu)
    assert(row.getAs[Long]("abs_err_top_down") == math.abs(td - actual))
    assert(row.getAs[Long]("abs_err_bottom_up") == math.abs(bu - actual))
    assert(td > 0 && bu > 0 && actual > 0)
    assert(row.getAs[Long]("n_nations") > 0)
    // median is between min and max of its window, so both forecasts are
    // bounded by 0 and the total revenue of any single month times nations
    assert(bu <= td * 3 && td <= bu * 3, s"implausible gap: td=$td bu=$bu")
  }

  test("q290: one row; revenue bounded by unfiltered quantity-sliced revenue") {
    import org.apache.spark.sql.functions._
    val r = queries.Tpch7Queries.q290DisjunctRevenue(spark, sfDir).collect()
    assert(r.length == 1)
    val rev = r.head.getAs[Double]("revenue")
    val n = r.head.getAs[Long]("n_items")
    assert(n > 0 && rev > 0)
    // upper bound: all lineitems in the quantity envelope, any brand/size
    val cap = queries.Kpis.table(spark, sfDir, "lineitem")
      .filter(col("l_quantity").between(1, 30))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
      .collect().head.getDouble(0)
    assert(rev <= cap + 1e-6, s"$rev > cap $cap")
  }
}
