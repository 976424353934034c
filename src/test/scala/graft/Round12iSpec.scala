package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-12j queries (q318–). */
class Round12iSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q318: yearly backlog ledger telescopes and peak dominates") {
    val rows = queries.TpchQueries.q318OrderBacklog(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per-year ledger: opening + starts − ends = closing; peak dominates
    rows.foreach { r =>
      val opening = r.getAs[Long]("opening")
      val closing = r.getAs[Long]("closing")
      val peak = r.getAs[Long]("peak")
      val starts = r.getAs[Long]("starts")
      val ends = r.getAs[Long]("ends")
      assert(opening + starts - ends == closing,
        s"yr ${r.getAs[Int]("yr")}: $opening + $starts - $ends != $closing")
      assert(peak >= opening && peak >= closing)
      assert(opening >= 0 && closing >= 0)
    }
    // cross-year: closing carries into the next year's opening
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("opening") == a.getAs[Long]("closing"),
          s"carry-in broke between ${a.getAs[Int]("yr")} and ${b.getAs[Int]("yr")}")
      case _ => ()
    }
    assert(rows.head.getAs[Long]("opening") == 0L)
    assert(rows.last.getAs[Long]("closing") == 0L,
      "every order closes, so the final backlog must drain to zero")
    // flow conservation: total starts = total ends = orders with lines
    val nOrders = queries.Kpis.table(spark, sfDir, "orders")
      .join(queries.Kpis.table(spark, sfDir, "lineitem")
        .select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(rows.map(_.getAs[Long]("starts")).sum == nOrders)
    assert(rows.map(_.getAs[Long]("ends")).sum == nOrders)
  }

  test("q318: first-year peak matches a brute-force interval count") {
    val spans = queries.Kpis.table(spark, sfDir, "orders")
      .join(queries.Kpis.table(spark, sfDir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("closed")),
        col("o_orderkey") === col("l_orderkey"))
      .select(to_date(col("o_orderdate")).as("opened"),
        greatest(col("closed"), to_date(col("o_orderdate"))).as("closed"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate))
    val rows = queries.TpchQueries.q318OrderBacklog(spark, sfDir).collect()
    val yr = rows.head.getAs[Int]("yr")
    // evaluate the backlog at every boundary date in the first year
    val boundaries = (spans.map(_._1) ++ spans.map(_._2.plusDays(1)))
      .filter(_.getYear == yr).distinct
    val brute = boundaries.map { d =>
      spans.count(s => !s._1.isAfter(d) && !s._2.isBefore(d)).toLong
    }.max
    // first year opens at 0, so the boundary max IS the peak
    assert(rows.head.getAs[Long]("peak") == brute,
      s"peak ${rows.head.getAs[Long]("peak")} vs brute $brute")
  }

  test("q319: fragmentation summary matches a driver-side recount") {
    val ks = queries.Kpis.table(spark, sfDir, "orders")
      .select(col("o_orderkey").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val gaps = ks.indices.drop(1).map(i => ks(i) - ks(i - 1) - 1)
    val runs = scala.collection.mutable.ArrayBuffer(1L)
    gaps.foreach { g =>
      if (g == 0) runs(runs.length - 1) += 1 else runs += 1L
    }
    val r = queries.StatsQueries.q319KeyFragmentation(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_keys") == ks.length.toLong)
    assert(r.getAs[Long]("min_key") == ks.head)
    assert(r.getAs[Long]("max_key") == ks.last)
    assert(r.getAs[Long]("span") == ks.last - ks.head + 1)
    assert(r.getAs[Long]("missing") == ks.last - ks.head + 1 - ks.length)
    assert(r.getAs[Long]("n_islands") == runs.length.toLong)
    assert(r.getAs[Long]("max_gap") == (if (gaps.isEmpty) 0L else gaps.max))
    assert(r.getAs[Long]("max_run") == runs.max)
  }

  test("q320: BH step-up is internally consistent over the 25-nation grid") {
    val rows = queries.ExperimentQueries.q320BhFdr(spark, sfDir).collect()
    assert(rows.length == 25, "the test family is the 25-nation design")
    val ranks = rows.map(_.getAs[Long]("rank")).sorted
    assert(ranks.sameElements(1L to 25L))
    val k = rows.head.getAs[Long]("k_bh")
    assert(rows.forall(_.getAs[Long]("k_bh") == k))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("rejected") == (r.getAs[Long]("rank") <= k))
      assert(r.getAs[Double]("chi2") >= 0.0)
    }
    // step-up: k is the LARGEST rank whose own threshold passes
    val passRanks = rows.filter(_.getAs[Boolean]("pass_own"))
      .map(_.getAs[Long]("rank"))
    assert(k == (if (passRanks.isEmpty) 0L else passRanks.max))
    // chi2 ordering follows rank
    val byRank = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("chi2"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("q320: one nation's chi2 matches the closed-form recount") {
    val cells = queries.Kpis.table(spark, sfDir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1997, 1998))
      .join(queries.Kpis.table(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(when(col("yr") === 1997, 1L).otherwise(0L)).as("a"),
        sum(when(col("yr") === 1998, 1L).otherwise(0L)).as("b"))
      .collect()
      .map(r => r.getAs[Int]("c_nationkey").toLong ->
        (r.getAs[Long]("a"), r.getAs[Long]("b"))).toMap
    val t97 = cells.values.map(_._1).sum
    val t98 = cells.values.map(_._2).sum
    val rows = queries.ExperimentQueries.q320BhFdr(spark, sfDir).collect()
    rows.filter(r => cells.contains(r.getAs[Int]("nation").toLong))
      .take(5).foreach { r =>
        val (a, b) = cells(r.getAs[Int]("nation").toLong)
        val (c, d) = (t97 - a, t98 - b)
        val det = (a * d - b * c).toDouble
        val den = ((a + b) * (c + d)).toDouble * ((a + c) * (b + d)).toDouble
        val chi2 = if (den == 0) 0.0 else (t97 + t98) * det * det / den
        assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-4,
          s"nation ${r.getAs[Int]("nation")}: ${r.getAs[Double]("chi2")} vs $chi2")
      }
  }

  test("q321: RBO profile is monotone, bounded, and matches the grid") {
    val grid = Seq(
      BigDecimal("0.100000000"), BigDecimal("0.045000000"),
      BigDecimal("0.027000000"), BigDecimal("0.018225000"),
      BigDecimal("0.013122000"), BigDecimal("0.009841500"),
      BigDecimal("0.007592014"), BigDecimal("0.005978711"),
      BigDecimal("0.004782969"), BigDecimal("0.003874205"))
    val rows = queries.RankQueries.q321RboOverlap(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("depth") == i + 1)
      assert(math.abs(r.getAs[Double]("w") - grid(i).toDouble) < 1e-12)
      val n = r.getAs[Long]("n_common")
      assert(n >= 0 && n <= i + 1, s"n_common $n exceeds depth ${i + 1}")
      assert(math.abs(r.getAs[Double]("contrib") -
        (grid(i) * BigDecimal(n)).toDouble) < 1e-12)
      assert(r.getAs[Double]("rbo_norm") >= 0.0 &&
        r.getAs[Double]("rbo_norm") <= 1.0 + 1e-12)
    }
    val ns = rows.map(_.getAs[Long]("n_common"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a <= b },
      "prefix intersections can only grow with depth")
    val cums = rows.map(_.getAs[Double]("rbo_cum"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b + 1e-15 })
  }

  test("q321: per-depth intersections match independently cut top-10 lists") {
    import graft.functions.VectorFunctions.{dotD, norm2}
    val lex10 = queries.RankQueries.q78Bm25(spark, sfDir)
      .limit(10).collect()
      .sortBy(r => (-r.getAs[Double]("bm25"), r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("doc_id"))
    val e = queries.Kpis.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("n2"))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("n2").as("qn2"))
    val sem10 = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", dotD(col("qe"), col("embedding")) /
        (sqrt(col("qn2")) * sqrt(col("n2"))))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10).collect().map(_.getAs[Long]("vec_id"))
    val rows = queries.RankQueries.q321RboOverlap(spark, sfDir).collect()
    rows.foreach { r =>
      val d = r.getAs[Int]("depth")
      val expected = lex10.take(d).toSet.intersect(sem10.take(d).toSet).size
      assert(r.getAs[Long]("n_common") == expected.toLong,
        s"depth $d: ${r.getAs[Long]("n_common")} vs $expected")
    }
  }

  test("q323: winsorized means match a driver-side recount") {
    val per = queries.Kpis.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
      .join(queries.Kpis.table(spark, sfDir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("s")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_nationkey"), coalesce(col("s"), lit(0L)).as("cents"))
      .collect()
      .map(r => (r.getAs[Int]("c_nationkey"), r.getAs[Long]("cents")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = queries.StatsQueries.q323WinsorizedMean(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vals = per(r.getAs[Int]("nation"))
      val n = vals.length
      val lo = vals(((n * 5 + 99) / 100).toInt - 1)
      val hi = vals(((n * 95 + 99) / 100).toInt - 1)
      assert(r.getAs[Long]("n_customers") == n.toLong)
      assert(r.getAs[Long]("lo_cents") == lo)
      assert(r.getAs[Long]("hi_cents") == hi)
      val wm = vals.map(v => math.max(lo, math.min(hi, v))).sum.toDouble / n
      assert(r.getAs[Double]("winsor_mean_cents") == wm)
      val rm = vals.sum.toDouble / n
      assert(r.getAs[Double]("raw_mean_cents") == rm)
      assert(lo <= hi)
    }
    assert(rows.length == per.size)
  }

  test("q324: sequencing census matches a driver-side reclassification") {
    val po = queries.Kpis.table(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), min(col("l_linenumber")).as("mn"),
        max(col("l_linenumber")).as("mx"),
        countDistinct(col("l_linenumber")).as("d"))
      .collect()
      .map(r => (r.getAs[Long]("n"), r.getAs[Int]("mn"),
        r.getAs[Int]("mx"), r.getAs[Long]("d")))
    val expected = po.groupBy { case (n, mn, mx, d) =>
      if (d < n) "1_duplicated"
      else if (mn == 1 && mx == n) "0_contiguous"
      else "2_gapped"
    }.view.mapValues(v => (v.length.toLong, v.map(_._1).sum)).toMap
    val rows = queries.QualityQueries.q324LinenumAudit(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[String]("class")).toSet == expected.keySet)
    rows.foreach { r =>
      val (nOrders, nLines) = expected(r.getAs[String]("class"))
      assert(r.getAs[Long]("n_orders") == nOrders)
      assert(r.getAs[Long]("n_lines") == nLines)
      assert(r.getAs[Double]("share") > 0.0 &&
        r.getAs[Double]("share") <= 1.0)
    }
    assert(rows.map(_.getAs[Long]("n_orders")).sum == po.length.toLong)
  }

  test("q325: Kruskal–Wallis H matches a driver-side midrank recount") {
    val obs = queries.Kpis.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"),
        col("l_quantity").cast("decimal(18,2)").cast("double").as("v"))
      .join(queries.Kpis.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority").as("g")),
        col("l_orderkey") === col("o_orderkey"))
      .select("g", "v").collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Double]("v")))
    val n = obs.length.toDouble
    // midranks over the pooled sample
    val byV = obs.map(_._2).groupBy(identity).view
      .mapValues(_.length).toMap
    val sortedVals = byV.keys.toSeq.sorted
    val midrank = sortedVals.foldLeft((Map.empty[Double, Double], 0L)) {
      case ((m, before), v) =>
        val t = byV(v).toLong
        (m + (v -> (before + (t + 1) / 2.0)), before + t)
    }._1
    val groups = obs.groupBy(_._1).view
      .mapValues(vs => (vs.length.toDouble, vs.map(p => midrank(p._2)).sum))
      .toMap
    val hRaw = 12.0 / (n * (n + 1)) *
      groups.values.map { case (ng, rg) => rg * rg / ng }.sum -
      3 * (n + 1)
    val ties = byV.values.map(t => t.toDouble * t * t - t).sum
    val hCorr = hRaw / (1.0 - ties / (n * n * n - n))
    val rows = queries.ExperimentQueries.q325KruskalWallis(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    assert(math.abs(rows.head.getAs[Double]("h_stat") - hRaw) < 1e-4)
    assert(math.abs(rows.head.getAs[Double]("h_tie_corrected") - hCorr)
      < 1e-4)
    rows.foreach { r =>
      val g = r.getAs[String]("priority")
      assert(r.getAs[Long]("n_lines") == groups(g)._1.toLong)
      // doubled rank sum = 2 * midrank sum
      assert(math.abs(r.getAs[Double]("rank_sum_x2") - 2 * groups(g)._2)
        < 1e-6)
      assert(r.getAs[Boolean]("reject_95") ==
        (r.getAs[Double]("h_tie_corrected") >= 9.487729 - 1e-3) ||
        math.abs(r.getAs[Double]("h_tie_corrected") - 9.487729) < 1e-2)
    }
    assert(rows.map(_.getAs[Long]("n_lines")).sum == obs.length.toLong)
  }

  test("q327: three BPE merges match a driver-side trainer") {
    val words = queries.Kpis.table(spark, sfDir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(
        lower(col("text")))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getAs[String]("w"), r.getAs[Long]("f")))
    // greedy left-to-right merge fold (the registered semantics)
    def applyMerge(syms: List[String], a: String, b: String): List[String] =
      syms.tail.foldLeft(List(syms.head)) { (acc, x) =>
        if (acc.last == a && x == b) acc.init :+ (a + b) else acc :+ x
      }
    var segs = words.map { case (w, f) =>
      (w.toSeq.map(_.toString).toList :+ "</w>", f)
    }
    val got = queries.LmQueries.q327BpeMergeLadder(spark, sfDir).collect()
    assert(got.length == 3)
    (1 to 3).foreach { step =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val (ba, bb) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
      val bc = counts((ba, bb))
      segs = segs.map { case (syms, f) => (applyMerge(syms, ba, bb), f) }
      val after = segs.map { case (syms, f) => syms.length * f }.sum
      val r = got(step - 1)
      assert(r.getAs[Int]("step") == step)
      assert(r.getAs[String]("left_sym") == ba,
        s"step $step: ${r.getAs[String]("left_sym")} vs $ba")
      assert(r.getAs[String]("right_sym") == bb)
      assert(r.getAs[Long]("pair_count") == bc)
      assert(r.getAs[Long]("symbols_after") == after)
    }
  }

  test("q328: IG ranking matches a driver-side entropy recount") {
    val base = queries.Kpis.table(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderstatus").as("label"),
        col("o_orderpriority"))
      .join(queries.Kpis.table(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("label"), col("o_orderpriority").as("priority"),
        col("c_mktsegment").as("segment"),
        col("c_nationkey").cast("string").as("nation"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3)))
    def entropy[K](xs: Seq[K]): Double = {
      val n = xs.length.toDouble
      xs.groupBy(identity).values
        .map(g => g.length / n * math.log(n / g.length)).sum
    }
    val rows = queries.InfoQueries.q328FeatureIg(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("feature")).sorted.sameElements(
      Seq("nation", "priority", "segment")))
    val feats = Map[String, ((String, String, String, String)) => String](
      "priority" -> (_._2), "segment" -> (_._3), "nation" -> (_._4))
    rows.foreach { r =>
      val f = feats(r.getAs[String]("feature"))
      val hL = entropy(base.map(_._1))
      val hF = entropy(base.map(f))
      val hJoint = entropy(base.map(t => (t._1, f(t))))
      val hCond = hJoint - hF
      assert(r.getAs[Long]("n_rows") == base.length.toLong)
      assert(math.abs(r.getAs[Double]("h_label") - hL) < 1e-4)
      assert(math.abs(r.getAs[Double]("h_cond") - hCond) < 1e-4)
      assert(math.abs(r.getAs[Double]("h_feature") - hF) < 1e-4)
      assert(math.abs(r.getAs[Double]("info_gain") - (hL - hCond)) < 1e-4)
      assert(r.getAs[Double]("info_gain") >= -1e-9,
        "information gain is non-negative")
      assert(r.getAs[Double]("gain_ratio") <= 1.0 + 1e-9)
    }
  }

  test("q329: bootstrap median CI brackets sanely and replays exactly") {
    val r = queries.EstimateQueries.q329MedianBootstrap(spark, sfDir)
      .collect().head
    assert(r.getAs[Int]("n_replicas") == 32)
    val lo = r.getAs[Double]("boot_lo")
    val hi = r.getAs[Double]("boot_hi")
    val obs = r.getAs[Double]("obs_median")
    assert(lo <= hi)
    // replay one replica driver-side with the registered md5 weights
    val rows = queries.Kpis.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(18,2)").cast("double").as("v"),
        graft.functions.TextFunctions.md5Hash60(
          concat(lit("mb:7:"), col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string"))).cast("double")
          ./(lit(1152921504606846976.0)).as("u"))
      .collect()
      .map(x => (x.getAs[Double]("v"), x.getAs[Double]("u")))
    def pw(u: Double): Long =
      if (u < 0.36787944117144233) 0L else if (u < 0.7357588823428847) 1L
      else if (u < 0.9196986029286058) 2L else if (u < 0.9810118431238463) 3L
      else if (u < 0.9963401531726563) 4L else 5L
    val weighted = rows.map { case (v, u) => (v, pw(u)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val tw = weighted.map(_._2).sum
    val target = (tw + 1) / 2
    val med7 = weighted.scanLeft(("", 0L)) { case ((_, acc), (v, w)) =>
      (v.toString, acc + w)
    }.drop(1).find(_._2 >= target).get._1.toDouble
    // every endpoint (and the replayed replica median) is a value from
    // the quantity DOMAIN — the estimator never interpolates
    val domain = rows.map(_._1).toSet
    assert(domain.contains(lo) && domain.contains(hi))
    assert(domain.contains(med7))
    // strict: observed median must equal the driver-side unweighted rule
    val census = rows.map(_._1).groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val n = census.map(_._2).sum
    val t2 = (n + 1) / 2
    val obsBrute = census.scanLeft((0.0, 0L)) { case ((_, acc), (v, c)) =>
      (v, acc + c)
    }.drop(1).find(_._2 >= t2).get._1
    assert(obs == obsBrute)
  }

  test("q330: kappa matches the confusion matrix q35 emits") {
    val cm = queries.DocQueries.q35LangIdNgram(spark, sfDir).collect()
      .map(r => ((r.getAs[String]("lang"), r.getAs[String]("predicted")),
        r.getAs[Long]("n_docs"))).toMap
    val n = cm.values.sum
    val diag = cm.collect { case ((l, p), c) if l == p => c }.sum
    val rmar = cm.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cmar = cm.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val peNum = rmar.map { case (l, r) =>
      r * cmar.getOrElse(l, 0L)
    }.sum
    val r = queries.DocQueries.q330LangidKappa(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_docs") == n)
    assert(r.getAs[Long]("n_correct") == diag)
    assert(r.getAs[Long]("pe_num") == peNum)
    val kappa = (n.toDouble * diag - peNum) / (n.toDouble * n - peNum)
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-12)
    assert(r.getAs[Double]("accuracy") >= r.getAs[Double]("kappa") - 1e-12,
      "chance correction can only lower the agreement score")
    assert(r.getAs[Double]("kappa") <= 1.0 + 1e-12)
  }

  test("q331: ECE/MCE match a driver-side reliability recount") {
    val xy = queries.Kpis.table(spark, sfDir, "customer")
      .select(col("c_custkey"))
      .join(queries.Kpis.table(spark, sfDir, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .filter(col("yr").between(1995, 2000))
        .groupBy(col("o_custkey"))
        .agg(sum(when(col("yr") <= 1997, 1L).otherwise(0L)).as("x0"),
          max(when(col("yr") >= 1998, 1L).otherwise(0L)).as("y0")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("x0"), lit(0L)).as("x"),
        coalesce(col("y0"), lit(0L)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bins = xy.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._2).sum)
    }.toMap
    def pOf(x: Long): BigDecimal =
      BigDecimal(1.0 / (1.0 + math.exp(-(x / 4.0 - 1.0))))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val n = xy.length.toLong
    val eceNum = bins.map { case (x, (nb, k)) =>
      (BigDecimal(k) - BigDecimal(nb) * pOf(x)).abs
    }.sum
    val ece = BigDecimal(eceNum.toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mce = bins.map { case (x, (nb, k)) =>
      BigDecimal(math.abs(k.toDouble / nb - pOf(x).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.max
    val r = queries.ExperimentQueries
      .q331CalibrationError(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_bins") == bins.size.toLong)
    assert(r.getAs[Long]("n_customers") == n)
    assert(math.abs(r.getAs[Double]("ece") - ece) < 2e-6)
    assert(math.abs(r.getAs[Double]("mce") - mce) < 2e-6)
    assert(r.getAs[Double]("mce") >= r.getAs[Double]("ece") - 1e-12,
      "the max bin gap dominates the weighted mean gap")
  }

  test("q332: bounded funnel is dominated by the unbounded one") {
    val bounded = queries.FunnelQueries.q332BoundedFunnel(spark, sfDir)
      .collect().map(r => r.getAs[Int]("stage") -> r.getAs[Long]("n_users"))
      .toMap
    val open = queries.FunnelQueries.q86Funnel(spark, sfDir)
      .collect().map(r => r.getAs[Int]("stage") -> r.getAs[Long]("n_users"))
      .toMap
    assert(bounded(1) == open(1), "stage 1 has no window to bound")
    assert(bounded(2) <= open(2) && bounded(3) <= open(3),
      "a window can only remove conversions")
    assert(bounded(1) >= bounded(2) && bounded(2) >= bounded(3))
    // stage-2 recount: first click within (t1, t1 + 7d]
    val ev = queries.Kpis.eventsTable(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts").getTime))
    val t1 = ev.filter(_._2 == "view").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val week = 7L * 24 * 3600 * 1000
    val s2 = ev.filter(_._2 == "click").filter { case (u, _, t) =>
      t1.get(u).exists(v => t > v && t <= v + week)
    }.map(_._1).distinct.length
    assert(bounded(2) == s2.toLong, s"${bounded(2)} vs $s2")
  }

  test("q333: frame census matches a driver-side codec replay") {
    import graft.multimodal.Multimodal
    val media = Multimodal.mediaFromDocuments(spark, sfDir).collect()
      .filter(_.meta.kind == "video")
    val frames = media.flatMap { r =>
      val d = Multimodal.Codec.decode(r.content)
      val fb = d.width * d.height
      (0 until d.frames).map { f =>
        val sum = (f * fb until (f + 1) * fb)
          .map(i => (d.payload(i) & 0xff).toLong).sum
        (r.media_id, d.frames, f, sum)
      }
    }
    val rows = Multimodal.q333FrameStats(spark, sfDir).collect()
    val byLen = frames.groupBy(_._2)
    assert(rows.map(_.getAs[Int]("frames_in_video")).toSet == byLen.keySet)
    rows.foreach { r =>
      val g = byLen(r.getAs[Int]("frames_in_video"))
      val vids = g.groupBy(_._1)
      assert(r.getAs[Long]("n_videos") == vids.size.toLong)
      assert(r.getAs[Long]("total_frames") == g.length.toLong)
      assert(r.getAs[Long]("sampled_frames") ==
        g.count(_._3 % 2 == 0).toLong)
      val changes = vids.values.map { fs =>
        fs.sortBy(_._3).map(_._4).sliding(2).count { p =>
          p.length == 2 && math.abs(p(1) - p(0)) >= 400
        }
      }.sum
      assert(r.getAs[Long]("n_scene_changes") == changes.toLong)
      assert(r.getAs[Long]("min_frame_sum") == g.map(_._4).min)
      assert(r.getAs[Long]("max_frame_sum") == g.map(_._4).max)
    }
  }

  test("q334: session opening paths match a driver-side sessionizer") {
    val ev = queries.Kpis.eventsTable(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").getTime * 1000L,
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val gap = 30L * 60 * 1000000
    val prefixes = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          if (b._2 - a._2 > gap)
            sessions += scala.collection.mutable.ArrayBuffer(b)
          else sessions.last += b
        case _ => ()
      }
      sessions.map(_.take(3).map(_._4).mkString(">"))
    }.toSeq
    val counts = prefixes.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(20)
    val rows = queries.SessionQueries.q334SessionPaths(spark, sfDir)
      .collect()
    assert(rows.length == counts.length)
    rows.zip(counts).foreach { case (r, (p, c)) =>
      assert(r.getAs[String]("path") == p,
        s"${r.getAs[String]("path")} vs $p")
      assert(r.getAs[Long]("n_sessions") == c.toLong)
      assert(r.getAs[Int]("depth") == p.split(">").length)
    }
    val total = prefixes.size
    rows.foreach { r =>
      val expected = BigDecimal(
        r.getAs[Long]("n_sessions").toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("share") - expected) < 1e-9)
    }
  }

  test("q335: fan bands match driver-side order statistics per month") {
    val cells = queries.Kpis.table(spark, sfDir, "orders")
      .join(queries.Kpis.table(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect()
      .map(r => (r.getAs[Long]("m"), r.getAs[Long]("cents")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val rows = queries.MarketQueries.q335RevenueFan(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("m")).toSet == cells.keySet)
    rows.foreach { r =>
      val vs = cells(r.getAs[Long]("m"))
      val n = vs.length
      def os(k: Int) = vs(((n * k + 99) / 100) - 1)
      assert(r.getAs[Long]("n_nations") == n.toLong)
      assert(r.getAs[Long]("min_cents") == vs.head)
      assert(r.getAs[Long]("p10_cents") == os(10))
      assert(r.getAs[Long]("median_cents") == os(50))
      assert(r.getAs[Long]("p90_cents") == os(90))
      assert(r.getAs[Long]("max_cents") == vs.last)
      assert(vs.head <= os(10) && os(10) <= os(50) && os(50) <= os(90) &&
        os(90) <= vs.last)
    }
  }

  test("q336: the log chain is the exact prefix sum of snapped links") {
    val rows = queries.MarketQueries.q336ChainedIndex(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ms = rows.map(_.getAs[Long]("m"))
    assert(ms.zip(ms.tail).forall { case (a, b) => a < b })
    var acc = BigDecimal(0)
    rows.foreach { r =>
      // re-snap the 6-dp link back through ln9: matches to grid error
      val link = r.getAs[Double]("link")
      assert(link > 0.0)
      val ln9 = BigDecimal(math.log(link))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      acc += ln9
      // the published 6-dp link loses precision vs the internal 9-dp
      // chain; bound the drift by the accumulated grid error
      assert(math.abs(r.getAs[Double]("chained_ln") - acc.toDouble)
        <= rows.length * 5e-7 + 1e-9,
        s"m=${r.getAs[Long]("m")}")
      assert(r.getAs[Long]("n_parts") > 0)
    }
  }

  test("q337: anomaly screen matches a driver-side median/MAD replay") {
    val cells = queries.Kpis.table(spark, sfDir, "orders")
      .join(queries.Kpis.table(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect()
      .map(r => (r.getAs[Int]("nation"), r.getAs[Long]("m"),
        r.getAs[Long]("cents")))
    def lowMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted; s(((s.length + 1) / 2) - 1)
    }
    val expected = cells.groupBy(_._1).toSeq.flatMap { case (nation, g) =>
      val med = lowMedian(g.toSeq.map(_._3))
      val mad = lowMedian(g.toSeq.map(x => math.abs(x._3 - med)))
      g.toSeq.filter(x => mad > 0 &&
          math.abs(x._3 - med) * 10000L >= 3L * 14826L * mad)
        .map(x => (nation, x._2) -> ((med, mad, x._3)))
    }.toMap
    val rows = queries.MarketQueries.q337RevenueAnomalies(spark, sfDir)
      .collect()
    assert(rows.length == expected.size,
      s"${rows.length} vs ${expected.size}")
    rows.foreach { r =>
      val key = (r.getAs[Int]("nation"), r.getAs[Long]("m"))
      val (med, mad, cents) = expected(key)
      assert(r.getAs[Long]("med") == med)
      assert(r.getAs[Long]("mad") == mad)
      assert(r.getAs[Long]("cents") == cents)
      assert(r.getAs[Double]("robust_z") >= 3.0 - 1e-6)
    }
  }

  test("q326: Jarque–Bera moments match a driver-side recount") {
    val obs = queries.Kpis.table(spark, sfDir, "documents")
      .filter(col("n_chars") > 0)
      .select(col("source"),
        round(log(col("n_chars").cast("double")), 4).as("x"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("x")))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = queries.CorpusStatsQueries.q326JarqueBera(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[String]("source")).toSet == obs.keySet)
    rows.foreach { r =>
      val xs = obs(r.getAs[String]("source"))
      val n = xs.length.toDouble
      val m1 = xs.sum / n
      val m2 = xs.map(x => (x - m1) * (x - m1)).sum / n
      val m3 = xs.map(x => math.pow(x - m1, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - m1, 4)).sum / n
      val skew = m3 / (m2 * math.sqrt(m2))
      val kurt = m4 / (m2 * m2) - 3.0
      val jb = n / 6.0 * (skew * skew + kurt * kurt / 4.0)
      assert(r.getAs[Long]("n_docs") == xs.length.toLong)
      assert(math.abs(r.getAs[Double]("mean_loglen") - m1) < 1e-4)
      assert(math.abs(r.getAs[Double]("var_loglen") - m2) < 1e-4)
      assert(math.abs(r.getAs[Double]("skewness") - skew) < 1e-3)
      assert(math.abs(r.getAs[Double]("excess_kurtosis") - kurt) < 1e-3)
      assert(math.abs(r.getAs[Double]("jb_stat") - jb) <
        math.max(1e-2, jb * 1e-3))
      assert(r.getAs[Boolean]("reject_normal_95") == (jb >= 5.991464547)
        || math.abs(jb - 5.991464547) < 1e-3)
    }
  }

  test("q322: Nelson–Aalen dominates Kaplan–Meier and the ledger is sane") {
    val na = queries.FunnelQueries.q322NelsonAalen(spark, sfDir).collect()
    assert(na.nonEmpty)
    val km = queries.FunnelQueries.q192KaplanMeier(spark, sfDir).collect()
      .map(r => r.getAs[Long]("gap_days") -> r.getAs[Double]("survival"))
      .toMap
    var lastH = 0.0
    var lastN = Long.MaxValue
    na.foreach { r =>
      val t = r.getAs[Long]("gap_days")
      val n = r.getAs[Long]("n_at_risk")
      val d = r.getAs[Long]("events")
      val h = r.getAs[Double]("cum_hazard")
      val fh = r.getAs[Double]("surv_fh")
      assert(d > 0 && n >= d)
      assert(n <= lastN, "risk set can only shrink"); lastN = n
      assert(h > lastH, "cumulative hazard strictly increases on event days")
      lastH = h
      // step = d/n on the 9-dp grid
      val step = BigDecimal(d.toDouble / n.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("hazard_step") - step) < 1e-12)
      assert(fh > 0.0 && fh <= 1.0)
      // Fleming–Harrington ≥ product-limit, pointwise (e^{-x} ≥ 1-x)
      km.get(t).foreach { s =>
        assert(fh >= s - 1e-9, s"t=$t: FH $fh below KM $s")
      }
      // same census as q192 where both report
      assert(km.contains(t), s"event day $t missing from the KM census")
    }
    assert(na.length == km.size,
      "both estimators report exactly the event days <= 60")
  }
}
