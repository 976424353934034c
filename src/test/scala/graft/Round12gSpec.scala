package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-12h queries (q256–). */
class Round12gSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q256: Theil decomposition closes and terms are ordered") {
    val r = queries.MarketQueries.q256TheilDecomposition(spark, sfDir)
      .collect().head
    val total = r.getAs[Double]("t_total")
    val between = r.getAs[Double]("t_between")
    val within = r.getAs[Double]("t_within_weighted")
    assert(total >= 0 && between >= 0 && within >= 0)
    assert(math.abs(r.getAs[Double]("decomposition_gap")) < 0.01,
      s"gap ${r.getAs[Double]("decomposition_gap")}")
    assert(between <= total + 1e-6)
  }

  test("q257: full pair matrix, JS within [0, ln 2]") {
    val rows = queries.InfoQueries.q257SourceJsMatrix(spark, sfDir).collect()
    val nSources = rows.flatMap(r =>
      Seq(r.getAs[String]("source_a"), r.getAs[String]("source_b")))
      .distinct.length
    assert(rows.length == nSources * (nSources - 1) / 2,
      s"${rows.length} pairs from $nSources sources")
    rows.foreach { r =>
      val js = r.getAs[Double]("js_nats")
      assert(js >= -1e-9 && js <= math.log(2.0) + 1e-9,
        s"${r.getAs[String]("source_a")}↔${r.getAs[String]("source_b")} js=$js")
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
  }

  test("q258: Hill alpha positive, k is the top decile, threshold positive") {
    val r = queries.StatsQueries.q258HillTailIndex(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n_customers")
    assert(r.getAs[Long]("k_tail") == n / 10)
    assert(r.getAs[Double]("threshold_spend") > 0)
    val alpha = r.getAs[Double]("hill_alpha")
    assert(alpha > 0 && alpha < 1000, s"alpha $alpha")
  }

  test("q259: entropies bounded by ln|types|, weighted gain is non-negative") {
    val rows = queries.InfoQueries.q259EntropyRate(spark, sfDir).collect()
    val lnTypes = math.log(rows.length.toDouble)
    var wGain = 0.0; var wTot = 0L
    rows.foreach { r =>
      val h = r.getAs[Double]("h_cond_nats")
      assert(h >= -1e-9 && h <= lnTypes + 1e-9, s"h_cond $h")
      assert(r.getAs[Double]("h_next_nats") <= lnTypes + 1e-9)
      wGain += r.getAs[Double]("info_gain_nats") * r.getAs[Long]("n_from")
      wTot += r.getAs[Long]("n_from")
    }
    // per-state gain may be negative; the transition-weighted average
    // is H(next) − H(next|cur) = I(cur; next) ≥ 0 by definition
    assert(wGain / wTot >= -1e-9, s"weighted gain ${wGain / wTot}")
  }

  test("q260: the four cells partition the customer universe") {
    val r = queries.ExperimentQueries.q260McnemarActivity(spark, sfDir)
      .collect().head
    val total = r.getAs[Long]("both_active") + r.getAs[Long]("p1_only") +
      r.getAs[Long]("p2_only") + r.getAs[Long]("neither")
    assert(total == r.getAs[Long]("n_customers"))
    assert(r.getAs[Double]("mcnemar_chi2") >= 0)
  }

  test("q261: Gumbel scale positive, return level beyond the mean max") {
    val r = queries.SeriesQueries.q261GumbelMaxima(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_blocks") >= 12)
    assert(r.getAs[Double]("gumbel_beta") > 0)
    assert(r.getAs[Double]("return_level_12") >
      r.getAs[Double]("mean_max"))
  }

  test("q262: occurrence accounting and top-5pct share bounds") {
    val r = queries.EmbedQueries.q262HubnessAudit(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n_vectors")
    assert(r.getAs[Long]("n_antihubs") <= n)
    assert(r.getAs[Long]("max_occurrence") <= n - 1)
    val share = r.getAs[Double]("hub_share_top5pct")
    // the top-5% most-listed vectors hold at least a 5% share by
    // construction (they are the maxima of the occurrence order)
    assert(share >= 0.05 - 1e-9 && share <= 1.0 + 1e-9, s"share $share")
  }

  test("q263: probabilities proper, overall Brier matches the group ledger") {
    val rows = queries.ExperimentQueries.q263BrierCalibration(spark, sfDir)
      .collect()
    val brier = rows.head.getAs[Double]("brier_score")
    assert(brier >= 0 && brier <= 1)
    var s = 0.0; var n = 0L
    rows.foreach { r =>
      val p = r.getAs[Double]("predicted")
      assert(p > 0 && p < 1)
      val o = r.getAs[Double]("observed")
      assert(o >= 0 && o <= 1)
      s += r.getAs[Double]("brier_sum"); n += r.getAs[Long]("n_customers")
    }
    assert(math.abs(s / n - brier) < 1e-5, s"ledger ${s / n} vs $brier")
  }

  test("q264: one row per priority, same densified day grid, D positive") {
    val rows = queries.SeriesQueries.q264DispersionIndex(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("n_days")).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Double]("dispersion_index") > 0)
      assert(r.getAs[Double]("mean_daily") > 0)
    }
  }

  test("q265: diversity indices within their analytic ranges") {
    val rows = queries.CorpusStatsQueries.q265YuleDiversity(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("yule_k") > 0)
      val s = r.getAs[Double]("simpson_repeat")
      assert(s > 0 && s < 1)
      val eff = r.getAs[Double]("eff_vocab")
      assert(eff > 1 && eff <= r.getAs[Long]("vocab") + 1e-6,
        s"${r.getAs[String]("lang")} eff=$eff vocab=${r.getAs[Long]("vocab")}")
    }
  }

  test("q266: the Wilson bound never exceeds the raw rate") {
    val rows = queries.TpchQueries.q266WilsonReliability(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lb = r.getAs[Double]("wilson_lb")
      val p = r.getAs[Double]("ontime_rate")
      assert(lb >= 0 && lb <= p + 1e-6, s"lb $lb rate $p")
      assert(r.getAs[Long]("k_ontime") <= r.getAs[Long]("n_items"))
    }
  }

  test("q267: Hill-number monotonicity q0 >= q1 >= q2") {
    val rows = queries.MarketQueries.q267DiversityProfile(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q0 = r.getAs[Long]("n_parts").toDouble
      val q1 = r.getAs[Double]("eff_parts_shannon")
      val q2 = r.getAs[Double]("eff_parts_simpson")
      assert(q0 + 1e-6 >= q1 && q1 + 1e-6 >= q2 && q2 >= 1 - 1e-6,
        s"${r.getAs[String]("nation")}: $q0 >= $q1 >= $q2 violated")
      val e = r.getAs[Double]("evenness")
      assert(e > 0 && e <= 1 + 1e-6)
    }
  }

  test("q269: flow totals equal the planted clone count, sources resolve") {
    val rows = queries.DocQueries.q269DupFlowMatrix(spark, sfDir).collect()
    val planted = queries.Kpis.table(spark, sfDir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
      .count()
    // every planted clone is a copy of a doc that now exists twice, so
    // total flow = number of clones (each group has exactly 1 non-canon)
    assert(rows.map(_.getAs[Long]("n_copies")).sum == planted)
    rows.foreach { r =>
      assert(r.getAs[String]("source_from").startsWith("src"))
      assert(r.getAs[String]("source_to").startsWith("src"))
    }
  }

  test("q270: buckets within range, conversion rates are probabilities") {
    val rows = queries.FunnelQueries.q270RecencyConversion(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 8)
      val c = r.getAs[Double]("conversion_rate")
      assert(c >= 0 && c <= 1)
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_customers"))
    }
  }

  test("q271: NB parameters appear exactly when overdispersed, p in (0,1)") {
    val rows = queries.StatsQueries.q271NegbinFit(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_orders")
      val v = r.getAs[Double]("var_orders")
      assert(m > 0 && v > 0)
      if (v > m) {
        assert(r.getAs[Double]("nb_r") > 0)
        val p = r.getAs[Double]("nb_p")
        assert(p > 0 && p < 1)
      } else {
        assert(r.isNullAt(r.fieldIndex("nb_r")))
        assert(r.isNullAt(r.fieldIndex("nb_p")))
      }
    }
  }

  test("q272: per-subspace utilization within the k=4 codebook bounds") {
    val rows = operators.KMeans.q272PqUtilization(spark, sfDir).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val used = r.getAs[Long]("codes_used")
      assert(used >= 1 && used <= 4)
      val h = r.getAs[Double]("entropy_nats")
      assert(h >= -1e-9 && h <= math.log(4.0) + 1e-6)
      val u = r.getAs[Double]("utilization")
      assert(u > 0 && u <= 1 + 1e-6)
      assert(r.getAs[Double]("top_code_share") >= 0.25 - 1e-9)
    }
  }

  test("q273: CAGR consistent with the endpoint ratio") {
    val rows = queries.MarketQueries.q273NationCagr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("rev_2000") / r.getAs[Double]("rev_1995")
      val c = r.getAs[Double]("cagr")
      assert(math.abs(math.pow(1.0 + c, 5.0) - ratio) < 1e-3,
        s"${r.getAs[String]("nation")}: (1+$c)^5 vs $ratio")
      assert(r.getAs[Long]("n_yoy") <= 5)
    }
  }

  test("q274: top-20 dispersion screen is sane and sorted") {
    val rows = queries.StatsQueries.q274PriceDispersion(spark, sfDir)
      .collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val cvs = rows.map(_.getAs[Double]("price_cv"))
    assert(cvs.sameElements(cvs.sorted.reverse))
    rows.foreach { r =>
      assert(r.getAs[Double]("price_cv") >= 0)
      assert(r.getAs[Double]("max_min_ratio") >= 1 - 1e-9)
      assert(r.getAs[Long]("n_lines") >= 10)
    }
  }

  test("q275: the build ledger balances stage by stage") {
    val rows = queries.VectorPipeline.q275VectorStoreLedger(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("stage_no"))
    assert(rows.length == 6)
    val byName = rows.map(r =>
      r.getAs[String]("stage") ->
        (r.getAs[Long]("rows_in"), r.getAs[Long]("rows_out"))).toMap
    val (nRaw, nIngest) = byName("ingest")
    val planted = queries.Kpis.table(spark, sfDir, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") % 10 === 0)
      .count()
    assert(nIngest == nRaw + planted)
    assert(byName("exact_dedup")._1 == nIngest)
    // every planted clone collapses back onto its original
    assert(byName("exact_dedup")._2 <= nRaw)
    // the gates/assignments preserve what dedup kept
    assert(byName("norm_gate")._2 == byName("ivf_assign")._1)
    assert(byName("ivf_assign")._2 == byName("ivf_assign")._1)
    assert(byName("pq_encode")._2 == byName("pq_encode")._1)
    assert(byName("probe_smoke")._2 > 0)
  }

  test("q276: MAE pair consistent with the emitted ratio") {
    val r = queries.SeriesQueries.q276MaseBacktest(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_months") >= 12)
    val m1 = r.getAs[Double]("mae_naive")
    val m12 = r.getAs[Double]("mae_seasonal_naive")
    assert(m1 > 0 && m12 > 0)
    assert(math.abs(m12 / m1 - r.getAs[Double]("seasonal_vs_naive")) < 1e-3)
  }

  test("q277: imbalance at least 1, cell accounting closes") {
    val r = operators.KMeans.q277IvfImbalance(spark, sfDir).collect().head
    assert(r.getAs[Double]("imbalance_factor") >= 1.0 - 1e-6)
    assert(r.getAs[Long]("n_cells_used") <= 8)
    assert(r.getAs[Long]("min_cell") <= r.getAs[Long]("max_cell"))
    assert(r.getAs[Long]("max_cell") <= r.getAs[Long]("n_vectors"))
  }

  test("q278: NMI within [0,1], MI bounded by both entropies") {
    val r = operators.KMeans.q278CellLabelNmi(spark, sfDir).collect().head
    val mi = r.getAs[Double]("mi_nats")
    val hx = r.getAs[Double]("h_cell")
    val hy = r.getAs[Double]("h_label")
    assert(mi >= -1e-9 && mi <= math.min(hx, hy) + 1e-6)
    val nmi = r.getAs[Double]("nmi")
    assert(nmi >= -1e-9 && nmi <= 1 + 1e-6, s"nmi $nmi")
  }

  test("q279: at most C(5,2) pairs, counts within marginals") {
    val rows = queries.SessionQueries.q279CooccurrenceLift(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      assert(r.getAs[Long]("n_both") > 0)
      assert(r.getAs[Double]("lift") > 0)
    }
  }

  test("q280: reversal accounting bounded by the brand census") {
    val r = queries.StatsQueries.q280SimpsonScreen(spark, sfDir)
      .collect().head
    val n = r.getAs[Long]("n_brands")
    val rev = r.getAs[Long]("n_reversed")
    assert(n > 0 && rev >= 0 && rev <= n)
    assert(math.abs(r.getAs[Double]("share_reversed") -
      rev.toDouble / n) < 1e-3)
  }

  test("q281: three operating points, loosest banding has full recall") {
    val rows = queries.DocQueries.q281LshCalibration(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("bands"))
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Int]("bands") * r.getAs[Int]("rows_per_band") == 16)
      val p = r.getAs[Double]("precision")
      assert(p > 0 && p <= 1)
      val rec = r.getAs[Double]("recall_vs_loosest")
      assert(rec > 0 && rec <= 1 + 1e-9)
      assert(r.getAs[Long]("n_verified") <= r.getAs[Long]("n_candidates"))
    }
    assert(math.abs(rows.last.getAs[Double]("recall_vs_loosest") - 1.0)
      < 1e-9, "the reference banding must have recall 1 vs itself")
  }

  test("q282: bucket shares partition the orders") {
    val rows = queries.TpchQueries.q282ShipmentSpread(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val s = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(s - 1.0) < 1e-3, s"shares sum to $s")
    rows.foreach(r =>
      assert(r.getAs[Double]("avg_lines_per_order") >= 1 - 1e-9))
  }

  test("q283: deciles cover the dup-injected corpus") {
    val rows = queries.DocQueries.q283DupByLength(spark, sfDir).collect()
    assert(rows.length == 10)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = queries.Kpis.table(spark, sfDir, "documents").count()
    assert(total == nDocs + nDocs / 10,
      s"decile total $total vs corpus ${nDocs + nDocs / 10}")
    rows.foreach { r =>
      val sh = r.getAs[Double]("dup_share")
      assert(sh >= 0 && sh <= 1)
    }
  }

  test("q284: 100-cell census, ratios mean 1, chi2 non-negative") {
    val rows = queries.InfoQueries.q284CentsHeaping(spark, sfDir).collect()
    assert(rows.length <= 100)
    val nTotal = rows.map(_.getAs[Long]("n_orders")).sum
    val wMean = rows.map(r => r.getAs[Double]("ratio_vs_uniform") *
      r.getAs[Long]("n_orders")).sum / nTotal
    rows.foreach { r =>
      assert(r.getAs[Long]("cents") >= 0 && r.getAs[Long]("cents") < 100)
      assert(r.getAs[Double]("chi2_term") >= 0)
    }
    assert(wMean > 0, s"weighted ratio mean $wMean")
  }

  test("q285: circadian JS matrix within [0, ln 2]") {
    val rows = queries.InfoQueries.q285CircadianJs(spark, sfDir).collect()
    assert(rows.length == 10) // C(5,2) event-type pairs
    rows.foreach { r =>
      val js = r.getAs[Double]("js_nats")
      assert(js >= -1e-9 && js <= math.log(2.0) + 1e-9)
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
    }
  }

  test("q286: local cc within [0,1], zero-share consistent") {
    val r = queries.GraphQueries.q286LocalClustering(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_nodes") > 0)
    val avg = r.getAs[Double]("avg_local_cc")
    val mx = r.getAs[Double]("max_local_cc")
    assert(avg >= 0 && avg <= mx + 1e-9 && mx <= 1 + 1e-9)
    val z = r.getAs[Double]("share_zero_cc")
    assert(z >= 0 && z <= 1)
    // if every node had cc 0 the average must be 0 too
    if (z == 1.0) assert(avg == 0.0)
  }

  test("q287: bucket entropies bounded by ln|types|") {
    val rows = queries.SessionQueries.q287BehavioralEntropy(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 3)
    val cap = math.log(5.0) + 1e-6
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_entropy_nats")
      val mx = r.getAs[Double]("max_entropy_nats")
      assert(avg >= -1e-9 && avg <= mx + 1e-9 && mx <= cap,
        s"${r.getAs[String]("bucket")}: avg=$avg max=$mx")
      assert(r.getAs[Long]("n_users") > 0)
    }
  }

  test("q288: drawdown bounded by its peak") {
    val r = queries.SeriesQueries.q288MaxDrawdown(spark, sfDir)
      .collect().head
    val peak = r.getAs[Double]("peak_revenue")
    val dd = r.getAs[Double]("max_drawdown")
    assert(peak > 0 && dd >= 0 && dd <= peak)
    val sh = r.getAs[Double]("drawdown_share")
    assert(sh >= 0 && sh <= 1)
  }

  test("q268: regularity shares are disjoint fractions") {
    val rows = queries.FunnelQueries.q268PurchaseRegularity(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cw = r.getAs[Double]("share_clockwork")
      val b = r.getAs[Double]("share_bursty")
      assert(cw >= 0 && b >= 0 && cw + b <= 1 + 1e-6)
      assert(r.getAs[Double]("avg_cv") > 0)
    }
  }
}
