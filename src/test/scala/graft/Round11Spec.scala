package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skyline
import graft.queries.{InfoQueries, MarketQueries, Tpch5Queries}

/** Round-11 additions: skyline operator (brute-force cross-check on
  * random data), TPC-H Q7/Q9 shapes, OHLC/TWAP determinism, and the
  * information-theoretic audits' analytic invariants.
  */
class Round11Spec extends AnyFunSuite {
  import SparkTestSession._

  // ------------------------------------------------------------ skyline
  test("skyline2d matches the quadratic dominance definition on random data") {
    import spark.implicits._
    // deterministic LCG — Math.random would make failures unreproducible
    var seed = 0x2545F4914F6CDD1DL
    def next(mod: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % mod).toInt + mod) % mod
    }
    // duplicate-heavy domain: ties on cost, gain, and full (cost,gain)
    val pts = (1 to 400).map(i => (i.toLong, next(40), next(25)))
    val df = pts.toDF("id", "cost", "gain")
    val got = Skyline.skyline2d(df, col("cost"), col("gain"))
      .select("id").as[Long].collect().toSet
    val want = pts.filter { case (_, c, g) =>
      !pts.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.map(_._1).toSet
    assert(got == want)
  }

  test("skyline frontier is an antichain with strictly improving gain") {
    val rows = Skyline.q134PartSkyline(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val frontier = rows.map(r =>
      (r.getAs[Double]("p_retailprice"), r.getAs[Int]("p_size")))
    // distinct (cost,gain) cells sorted by cost must strictly increase gain
    val cells = frontier.distinct.sortBy(_._1)
    cells.sliding(2).foreach {
      case Array((c1, g1), (c2, g2)) =>
        assert(c1 < c2 && g1 < g2,
          s"dominated cell on frontier: ($c1,$g1) vs ($c2,$g2)")
      case _ => ()
    }
  }

  test("q132 plan: ship-date pushed to lineitem scan; dims broadcast; no product") {
    val df = Tpch5Queries.q132VolumeShipping(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val liScan = scans.find(_.contains("lineitem.parquet")).getOrElse("")
    assert(liScan.contains("PushedFilters") && liScan.contains("l_shipdate"),
      s"ship-date predicate not pushed:\n$liScan")
    assert(plan.contains("BroadcastHashJoin"), "nation slices not broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q134 plan: frontier restored via broadcast semi-join, no product") {
    val plan = Skyline.q134PartSkyline(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("BroadcastHashJoin"),
      s"skyline restore is not a broadcast semi-join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  // -------------------------------------------------------------- TPC-H
  test("q132 volume shipping: both directions, filter years only") {
    val rows = Tpch5Queries.q132VolumeShipping(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getAs[String]("supp_nation"),
      r.getAs[String]("cust_nation"))).toSet
    pairs.foreach { case (s, c) => assert(s != c) }
    assert(rows.forall(r => Set(1996L, 1997L)(r.getAs[Long]("l_year"))))
    assert(rows.forall(_.getAs[Double]("revenue") > 0.0))
  }

  test("q133 nation profit: n_items positive, grouped keys unique") {
    val rows = Tpch5Queries.q133NationProfit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getAs[String]("nation"), r.getAs[Long]("o_year")))
    assert(keys.distinct.length == keys.length)
    assert(rows.forall(_.getAs[Long]("n_items") > 0))
  }

  // ---------------------------------------------------------- OHLC/TWAP
  test("q135 OHLC: low <= open/close <= high, bars cover all events") {
    val bars = MarketQueries.q135OhlcHourly(spark, sfDir).collect()
    assert(bars.nonEmpty)
    bars.foreach { b =>
      val (o, h, l, c) = (b.getAs[Double]("open"), b.getAs[Double]("high"),
        b.getAs[Double]("low"), b.getAs[Double]("close"))
      assert(l <= o && o <= h && l <= c && c <= h)
    }
    val nEvents = graft.queries.Kpis.eventsTable(spark, sfDir).count()
    assert(bars.map(_.getAs[Long]("n_events")).sum == nEvents)
  }

  test("q136 TWAP: bounded by per-user min/max value") {
    val twap = MarketQueries.q136TwapValue(spark, sfDir)
    val bounds = graft.queries.Kpis.eventsTable(spark, sfDir)
      .groupBy("user_id").agg(min("value").as("lo"), max("value").as("hi"))
    val joined = twap.join(bounds, "user_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val t = r.getAs[Double]("twap")
      assert(t >= r.getAs[Double]("lo") - 1e-6 &&
        t <= r.getAs[Double]("hi") + 1e-6, s"TWAP $t outside value range")
    }
  }

  // ----------------------------------------------------- info-theoretic
  test("q137 MI: 0 <= MI <= min(H(seg), H(nation)), entropies <= ln(k)") {
    val r = InfoQueries.q137MutualInfo(spark, sfDir).collect().head
    val (mi, hs, hn) = (r.getAs[Double]("mi_nats"),
      r.getAs[Double]("h_segment"), r.getAs[Double]("h_nation"))
    // 9-dp rounding of each weighted log term can push the aggregate a
    // hair past the analytic bound — tolerance covers exactly that
    val eps = 1e-6
    assert(mi >= -eps && mi <= math.min(hs, hn) + eps)
    assert(hs > 0 && hs <= math.log(5.0) + eps) // 5 market segments
    assert(hn > 0)
  }

  test("q138 Benford: digits 1-9, expected freqs sum to 1, chi2 >= 0") {
    val rows = InfoQueries.q138BenfordAudit(spark, sfDir).collect()
    val digits = rows.map(_.getAs[Long]("digit"))
    assert(digits.forall(d => d >= 1 && d <= 9))
    assert(digits.distinct.length == digits.length)
    // expected Benford masses over ALL nine digits sum to 1 (data may
    // not surface every digit; check the law itself on 1..9)
    val law = (1 to 9).map(d => math.log(1.0 + 1.0 / d) / math.log(10.0)).sum
    assert(math.abs(law - 1.0) < 1e-12)
    rows.foreach(r => assert(r.getAs[Double]("chi2_term") >= 0.0))
  }

  test("q140 KL: non-negative per source, doc counts partition the corpus") {
    val rows = InfoQueries.q140SourceLangKl(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("kl_nats") >= -1e-6))
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
  }

  // ---------------------------------------------------------- novelty
  test("q141 novelty: in [0,1], first doc fully novel, counts bounded") {
    val rows = graft.queries.NoveltyQueries.q141TrigramNovelty(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nov = r.getAs[Double]("novelty")
      assert(nov >= 0.0 && nov <= 1.0)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_distinct_trigrams"))
    }
    // the lowest doc_id can't restate anyone earlier
    assert(rows.minBy(_.getAs[Long]("doc_id")).getAs[Double]("novelty") == 1.0)
  }

  test("q142 entropy: 0 <= H <= ln(distinct chars), counts consistent") {
    val rows = graft.queries.NoveltyQueries.q142CharEntropy(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_nats")
      val k = r.getAs[Long]("n_distinct_chars")
      assert(h >= 0.0 && h <= math.log(k.toDouble) + 1e-6,
        s"H=$h outside [0, ln($k)]")
      assert(k <= r.getAs[Long]("n_chars"))
    }
  }

  test("q143 deciles: all ten present, masses partition total revenue") {
    val rows = MarketQueries.q143RevenueDeciles(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("decile")).toSeq == (1 to 10))
    val shares = rows.map(_.getAs[Double]("revenue_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    // equal-revenue cuts: each bucket holds ~1/10th of revenue, off by
    // at most one customer's spend
    shares.foreach(s => assert(s > 0.02 && s < 0.2, s"share $s"))
    // concentration: the top-revenue decile needs the fewest customers
    val counts = rows.map(_.getAs[Long]("n_customers"))
    assert(counts.head == counts.min)
  }

  test("q144 Theil-Sen: slope bracketed by pairwise extremes, counts right") {
    val r = graft.queries.StatsQueries.q144TheilsenTrend(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n_days")
    assert(n > 300 && n <= 366, s"1996 daily series has $n days")
    assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2)
    val slope = r.getAs[Double]("ts_slope")
    // a median of slopes lies strictly inside the pairwise extremes,
    // and the robust fit should reconstruct typical daily revenue
    val daily = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1997-01-01")
      .groupBy(to_date(col("l_shipdate"))).agg(sum(
        col("l_extendedprice") * (lit(1) - col("l_discount"))).as("y"))
      .agg(min("y"), max("y")).collect().head
    val (lo, hi) = (daily.getDouble(0), daily.getDouble(1))
    val mid = r.getAs[Double]("ts_intercept") + slope * 183.0
    assert(mid >= lo && mid <= hi,
      s"fit at mid-year $mid outside daily range [$lo, $hi]")
  }

  test("q145 lead times: ship never precedes order; p50 <= p90 <= max") {
    val rows = Tpch5Queries.q145LeadtimePercentiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90) = (r.getAs[Double]("p50_days"), r.getAs[Double]("p90_days"))
      assert(p50 >= 0.0 && p50 <= p90,
        s"${r.getAs[String]("o_orderpriority")}: p50=$p50 p90=$p90")
      assert(r.getAs[Double]("mean_days") >= 0.0)
    }
  }

  test("q146 LTV: cumulative per cohort is monotone in k") {
    val rows = graft.queries.FunnelQueries.q146CohortLtv(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("cohort_month")).foreach { case (cm, rs) =>
      val ltv = rs.sortBy(_.getAs[Long]("k")).map(_.getAs[Double]("ltv_per_customer"))
      ltv.sliding(2).foreach {
        case Array(a, b) => assert(a <= b, s"cohort $cm LTV not monotone")
        case _ => ()
      }
      // month 0 always exists: every cohort member ordered in its month
      assert(rs.exists(_.getAs[Long]("k") == 0L), s"cohort $cm missing k=0")
    }
  }

  test("q147 Heaps: sublinear growth exponent in (0,1), all docs counted") {
    val r = graft.queries.CorpusStatsQueries.q147HeapsFit(spark, sfDir)
      .collect().head
    val beta = r.getAs[Double]("heaps_beta")
    // natural-language vocabulary grows sublinearly; a beta at or above
    // 1 would mean every token is forever new (broken first-carrier
    // credit), at or below 0 a non-growing vocabulary
    assert(beta > 0.0 && beta < 1.0, s"Heaps beta $beta outside (0,1)")
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(length(trim(col("text"))) > 0).count()
    assert(r.getAs[Long]("n_docs") == nDocs)
  }

  test("q148 seasonal: 12 indices averaging to ~1 weighted by days") {
    val rows = graft.queries.SeriesQueries.q148SeasonalIndex(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Int]("month")).toSeq == (1 to 12))
    rows.foreach(r => assert(r.getAs[Double]("seasonal_index") > 0.0))
    // day-weighted mean of the indices is exactly 1 by construction
    val wsum = rows.map(r =>
      r.getAs[Double]("seasonal_index") * r.getAs[Long]("n_days")).sum
    val days = rows.map(_.getAs[Long]("n_days")).sum
    assert(math.abs(wsum / days - 1.0) < 1e-9)
  }

  test("q149 weighted median: splits revenue mass at the pick") {
    val rows = graft.queries.StatsQueries.q149WeightedMedianQty(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .collect()
    rows.foreach { r =>
      val (flag, m) = (r.getAs[String]("l_returnflag"), r.getAs[Long]("wmedian_qty"))
      val g = li.filter(_.getAs[String]("l_returnflag") == flag)
      val tot = g.map(_.getAs[Double]("rev")).sum
      val below = g.filter(_.getAs[Double]("l_quantity") < m)
        .map(_.getAs[Double]("rev")).sum
      val atOrBelow = g.filter(_.getAs[Double]("l_quantity") <= m)
        .map(_.getAs[Double]("rev")).sum
      assert(below < tot / 2 + 1e-6 && atOrBelow >= tot / 2 - 1e-6,
        s"$flag: median $m does not split revenue ($below / $atOrBelow / $tot)")
    }
  }

  test("q150 KS: statistic in [0,1] and reproducible from raw CDFs") {
    val r = graft.queries.ExperimentQueries.q150KsDrift(spark, sfDir)
      .collect().head
    val ks = r.getAs[Double]("ks_stat")
    assert(ks >= 0.0 && ks <= 1.0)
    // brute-force replica from raw rows
    val ev = queries.Kpis.eventsTable(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "value").collect()
    val click = ev.filter(_.getString(0) == "click").map(_.getDouble(1)).sorted
    val buy = ev.filter(_.getString(0) == "purchase").map(_.getDouble(1)).sorted
    val support = (click ++ buy).distinct.sorted
    val brute = support.map { x =>
      math.abs(click.count(_ <= x).toDouble / click.length -
        buy.count(_ <= x).toDouble / buy.length)
    }.max
    assert(math.abs(ks - brute) < 1e-12, s"KS $ks vs brute $brute")
    assert(r.getAs[Long]("n1") == click.length &&
      r.getAs[Long]("n2") == buy.length)
  }

  test("q151 RRF: scores bounded, a doc ranked #1 in both lists wins") {
    val rows = graft.queries.RankQueries.q151RrfFusion(spark, sfDir).collect()
    assert(rows.length == 20)
    val rrf = rows.map(_.getAs[Double]("rrf"))
    // descending, and each score within (0, 2/61]
    assert(rrf.sameElements(rrf.sorted.reverse))
    rrf.foreach(s => assert(s > 0.0 && s <= 2.0 / 61.0 + 1e-12))
    rows.foreach { r =>
      val (rl, rs) = (r.getAs[Int]("r_lex"), r.getAs[Int]("r_sem"))
      assert(rl >= 0 && rs >= 0 && (rl > 0 || rs > 0))
      val want =
        (if (rl > 0) 1.0 / (60.0 + rl) else 0.0) +
          (if (rs > 0) 1.0 / (60.0 + rs) else 0.0)
      assert(r.getAs[Double]("rrf") == want)
    }
  }

  test("q152 greedy cover: gains non-increasing, coverage telescopes") {
    val rows = graft.queries.NoveltyQueries.q152GreedyCover(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("step"))
    assert(rows.map(_.getAs[Int]("step")).toSeq == Seq(1, 2, 3))
    val gains = rows.map(_.getAs[Long]("gain"))
    // submodularity: each marginal gain can't beat the previous pick's
    gains.sliding(2).foreach {
      case Array(a, b) => assert(b <= a, s"gains not non-increasing: $gains")
      case _ => ()
    }
    // coverage after step k = sum of the marginal gains so far
    val covered = rows.map(_.getAs[Long]("covered"))
    assert(covered.toSeq == gains.scanLeft(0L)(_ + _).tail.toSeq)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 3)
  }

  // ------------------------------------------------------------- RFM
  test("q139 RFM: scores in 1..5, customer census partitions orderers") {
    val rows = MarketQueries.q139RfmSegments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Int](c); assert(v >= 1 && v <= 5)
      }
    }
    val nOrderers = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nOrderers)
  }
}
