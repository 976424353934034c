package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12c invariants for q169–q177: the oracle hashes pin exact
  * values; these assert the STRUCTURAL properties any correct
  * implementation must have, plus cross-operator consistency (weighted
  * SSSP vs BFS reachability, AR(1) vs CUSUM day accounting). */
class Round12cSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q169 CUSUM: interior changepoint, level shift is real, stat positive") {
    val r = SparkEntry.queries("q169_cusum_changepoint")(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val k = row.getAs[Long]("day_index")
    val n = row.getAs[Long]("n_days")
    assert(k >= 1 && k < n, s"changepoint must be interior: k=$k n=$n")
    assert(row.getAs[Double]("cusum_stat") > 0.0)
    // the split means must actually differ (else no argmax uniqueness)
    assert(row.getAs[Double]("mean_before") != row.getAs[Double]("mean_after"))
  }

  test("q177 AR(1): pair accounting matches q169's day census; forecast reconciles") {
    val cusum = SparkEntry.queries("q169_cusum_changepoint")(spark, sfDir)
      .collect().head
    val ar = SparkEntry.queries("q177_ar1_forecast")(spark, sfDir)
      .collect().head
    assert(ar.getAs[Long]("n_pairs") == cusum.getAs[Long]("n_days") - 1,
      "lag-1 pairs must be exactly |days| - 1")
    val phi = ar.getAs[Double]("phi")
    val c = ar.getAs[Double]("intercept")
    val last = ar.getAs[Double]("last_rev")
    assert(ar.getAs[Double]("forecast_next") == c + phi * last,
      "forecast must be the exact double chain c + phi*last")
  }

  test("q172 permutation test: p in (0,1], 64 perms, observed diff finite") {
    val r = SparkEntry.queries("q172_permutation_test")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_perms") == 64L)
    val p = r.getAs[Double]("p_value")
    assert(p > 0.0 && p <= 1.0, s"p=$p")
    assert(r.getAs[Long]("n_exceed") <= 64L)
    assert(!r.getAs[Double]("obs_abs_diff").isNaN)
  }

  test("q174 Gini: every nation in [0,1), spend positive") {
    val rows = SparkEntry.queries("q174_nation_gini")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"${r.getAs[String]("n_name")}: gini=$g")
      assert(r.getAs[Double]("total_spend") > 0.0)
    }
  }

  test("q173 weighted SSSP reaches exactly q123's 4-hop BFS set; seed cost 0") {
    val bfs = SparkEntry.queries("q123_khop_bfs")(spark, sfDir)
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    val sp = SparkEntry.queries("q173_cheapest_paths")(spark, sfDir).collect()
    val nodes = sp.map(_.getAs[Long]("p_partkey")).toSet
    assert(nodes == bfs,
      "positive weights cannot change 4-hop reachability vs BFS")
    val costs = sp.map(r =>
      r.getAs[Long]("p_partkey") -> r.getAs[Long]("path_cost")).toMap
    assert(costs.values.count(_ == 0L) == 1, "exactly one zero-cost node (the seed)")
    assert(costs(nodes.min) >= 0L && costs.values.forall(_ >= 0L))
  }

  test("q176 MRL recall: probe slice matches q163's cert ids, recall in [0,1]") {
    val mrl = SparkEntry.queries("q176_mrl_recall")(spark, sfDir).collect()
    val sq8 = SparkEntry.queries("q163_sq8_recall")(spark, sfDir).collect()
    assert(mrl.map(_.getAs[Long]("probe_id")).toSet ==
      sq8.map(_.getAs[Long]("probe_id")).toSet,
      "both certifications must audit the same fixed probe slice")
    mrl.foreach { r =>
      val rec = r.getAs[Double]("recall5")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Double]("max_abs_cos_err") >= 0.0)
    }
  }

  test("q171 as-of snapshot: covered customers <= SCD2 key count, versions start at 1") {
    val snap = SparkEntry.queries("q171_scd2_asof")(spark, sfDir).collect()
    assert(snap.nonEmpty)
    val covered = snap.map(_.getAs[Long]("n_customers")).sum
    val keys = SparkEntry.queries("q54_priority_scd2")(spark, sfDir)
      .select("custkey").distinct().count()
    assert(covered <= keys,
      "as-of rows are a sub-state of the dimension: one interval max per key")
    snap.foreach { r =>
      assert(r.getAs[Long]("n_changed_before") <= r.getAs[Long]("n_customers"))
    }
  }

  test("q175 FD audit: the key positive-control holds exactly, false FDs carry violations") {
    val rows = SparkEntry.queries("q175_fd_audit")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[String]("lhs")) -> r)
      .toMap
    val control = rows(("orders", "o_orderkey"))
    assert(control.getAs[Long]("g3_violations") == 0L &&
      control.getAs[Double]("g3_error") == 0.0,
      "o_orderkey is a key: its FD must hold exactly")
    val false1 = rows(("orders", "o_custkey"))
    assert(false1.getAs[Long]("g3_violations") > 0L)
    rows.values.foreach { r =>
      val g3 = r.getAs[Double]("g3_error")
      assert(g3 >= 0.0 && g3 < 1.0)
      assert(r.getAs[Long]("n_lhs_values") <= r.getAs[Long]("n_rows"))
    }
  }

  test("q170 readability: all langs present, counts consistent, flesch finite") {
    val rows = SparkEntry.queries("q170_readability")(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("lang")).toSet ==
      Set("en", "zh", "es", "de", "fr"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_syllables") <= 10L * r.getAs[Long]("n_words"),
        "vowel runs are bounded by a small multiple of words on this corpus")
      assert(r.getAs[Long]("n_words") > 0L)
      assert(!r.getAs[Double]("flesch").isNaN)
    }
  }

  test("q178 trimmed mean: trimming tightens toward the middle, counts reconcile") {
    val rows = SparkEntry.queries("q178_trimmed_mean")(spark, sfDir).collect()
    assert(rows.length == 5, "five order priorities")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_orders")
      val k = r.getAs[Long]("n_trimmed_each_side")
      assert(k == n / 10, "trim depth is floor(n/10) per side")
      val all = r.getAs[Double]("mean_all")
      val trimmed = r.getAs[Double]("mean_trimmed")
      assert(!trimmed.isNaN && trimmed > 0.0)
      // o_totalprice is right-skewed: trimming must pull the mean DOWN,
      // and never beyond the untrimmed spread
      assert(trimmed != all || k == 0L)
    }
  }

  test("q179 chi-square: dof matches the 5x5 design, V in [0,1]") {
    val r = SparkEntry.queries("q179_chi2_independence")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("dof") == 16L, "5 segments x 5 priorities -> dof 16")
    assert(r.getAs[Double]("chi2") >= 0.0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q180 silhouette: s in [-1,1] per label, all labels present, random labels overlap") {
    val rows = SparkEntry.queries("q180_silhouette")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("label")).toSet == (0 to 9).toSet)
    rows.foreach { r =>
      val s = r.getAs[Double]("mean_silhouette")
      assert(s >= -1.0 && s <= 1.0,
        s"label ${r.getAs[Int]("label")}: mean silhouette $s out of range")
      assert(r.getAs[Long]("n_vecs") > 0L)
    }
  }

  test("q181 split leakage: pair cells reconcile with the fingerprint census and find cross-split dups") {
    val cells = SparkEntry.queries("q181_split_leakage")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("split_a"), r.getAs[String]("split_b")) ->
        r.getAs[Long]("n_dup_pairs")).toMap
    assert(cells.size == 6)
    // independent total: sum over fingerprint groups of C(n,2) on the
    // same injected corpus
    val expected = graft.queries.DocQueries
      .corpusWithExactDups(spark, sfDir)
      .select(graft.functions.TextFunctions.fingerprint(
        org.apache.spark.sql.functions.col("text")).as("fp"))
      .groupBy("fp").count()
      .collect().map(r => { val n = r.getAs[Long]("count"); n * (n - 1) / 2 })
      .sum
    assert(cells.values.sum == expected,
      "the 6 cells must partition ALL duplicate pairs")
    val cross = cells.filterNot { case ((a, b), _) => a == b }.values.sum
    assert(cross > 0, "the injected dup corpus must exhibit cross-split leakage")
  }

  test("q182 inter-arrival: positive gaps, CV defined, rate reconciles with mean") {
    val rows = SparkEntry.queries("q182_interarrival_fit")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mean = r.getAs[Double]("mean_gap_seconds")
      val rate = r.getAs[Double]("rate_per_hour")
      assert(mean > 0.0 && r.getAs[Long]("n_gaps") > 0L)
      assert(r.getAs[Double]("cv") > 0.0)
      assert(math.abs(rate * mean - 3600.0) < 1e-6,
        s"rate*mean must be one hour: ${rate * mean}")
    }
  }

  test("q183 effective dim: PR in (1, 64], variance positive") {
    val r = SparkEntry.queries("q183_effective_dim")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_dims") == 64L)
    assert(r.getAs[Double]("total_var") > 0.0)
    val ed = r.getAs[Double]("effective_dim")
    assert(ed > 1.0 && ed <= 64.0, s"participation ratio $ed out of range")
  }

  test("q184 vocab richness: census inequalities hold per language") {
    val rows = SparkEntry.queries("q184_vocab_richness")(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[String]("lang")).toSet ==
      Set("en", "zh", "es", "de", "fr"))
    rows.foreach { r =>
      val (n, v, h) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"),
        r.getAs[Long]("hapax"))
      assert(v <= n && h <= v,
        s"${r.getAs[String]("lang")}: vocab $v tokens $n hapax $h")
      assert(r.getAs[Double]("type_token_ratio") > 0.0 &&
        r.getAs[Double]("type_token_ratio") <= 1.0)
    }
  }

  test("q185 churn risk: rates bounded, overdue never exceeds repeat customers") {
    val rows = SparkEntry.queries("q185_churn_risk")(spark, sfDir).collect()
    assert(rows.length == 5, "five market segments")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_overdue") <= r.getAs[Long]("n_repeat_customers"))
      val rate = r.getAs[Double]("overdue_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Double]("avg_days_since_last") >= 0.0)
    }
  }

  test("q186 degree distribution: totals reconcile with q111's graph, slope negative") {
    val tri = SparkEntry.queries("q111_triangles")(spark, sfDir)
      .collect().head
    val dd = SparkEntry.queries("q186_degree_dist")(spark, sfDir)
      .collect().head
    assert(dd.getAs[Long]("n_nodes") == tri.getAs[Long]("n_nodes"))
    assert(dd.getAs[Long]("n_edges") == tri.getAs[Long]("n_edges"))
    assert(dd.getAs[Long]("max_degree") >= 1L)
    assert(dd.getAs[Long]("n_distinct_degrees") <= dd.getAs[Long]("n_nodes"))
    // slope SIGN is fixture-dependent at tiny scale (too few census
    // points); the fit just has to be finite and sane
    val slope = dd.getAs[Double]("powerlaw_slope")
    assert(!slope.isNaN && math.abs(slope) < 10.0)
  }

  test("q187 PSI: all sources scored, PSI non-negative and small on a homogeneous corpus") {
    val rows = SparkEntry.queries("q187_psi_drift")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val psi = r.getAs[Double]("psi")
      // PSI is a sum of (p-q)ln(p/q) terms, each >= 0 up to the 9-dp snap
      assert(psi >= -1e-6, s"${r.getAs[String]("source")}: psi $psi")
      assert(r.getAs[Long]("n_docs") > 0L)
    }
  }

  test("q188 supplier HHI: index bounded by (1/k, 1], top list ordered") {
    val rows = SparkEntry.queries("q188_supplier_hhi")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val k = r.getAs[Long]("n_suppliers")
      val hhi = r.getAs[Double]("hhi")
      assert(k >= 2L)
      assert(hhi > 1.0 / k && hhi <= 1.0,
        s"part ${r.getAs[Long]("p_partkey")}: hhi $hhi with $k suppliers")
    }
    val hhis = rows.map(_.getAs[Double]("hhi")).toSeq
    assert(hhis == hhis.sorted.reverse, "must be ordered most-concentrated first")
  }

  test("q189 cluster census: doc accounting reconciles with q45's labels") {
    val labels = SparkEntry.queries("q45_dup_clusters")(spark, sfDir).collect()
    val census = SparkEntry.queries("q189_cluster_census")(spark, sfDir)
      .collect()
    assert(census.map(_.getAs[Long]("n_docs")).sum == labels.length,
      "census docs must equal labeled docs")
    census.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("cluster_size") >= 2L,
        "CC labels only nodes with at least one edge")
    }
  }

  test("q190 segment digests flag exactly the perturbed segments with the right class") {
    import org.apache.spark.sql.functions.{col, expr}
    val keys = graft.queries.Kpis.table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), expr("o_orderkey div 1024").as("seg"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("seg")))
    val dropSegs = keys.filter(_._1 % 1000 == 7).map(_._2).toSet
    val repriceSegs = keys.filter(_._1 % 1000 == 13).map(_._2).toSet
    val flagged = SparkEntry.queries("q190_segment_digest_diff")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("segment") -> r.getAs[String]("status")).toMap
    assert(flagged.keySet == (dropSegs ++ repriceSegs),
      "flagged segments must be exactly those containing a perturbed key")
    flagged.foreach { case (seg, status) =>
      if (dropSegs(seg)) assert(status == "count_drift", s"seg $seg")
      else assert(status == "content_drift", s"seg $seg")
    }
  }

  test("q191 entity clusters: census covers every node of q81's match graph") {
    val pairs = SparkEntry.queries("q81_fuzzy_names")(spark, sfDir)
      .select("id_1", "id_2").collect()
    val nodes = pairs.flatMap(r =>
      Seq(r.getAs[Long]("id_1"), r.getAs[Long]("id_2"))).toSet
    val census = SparkEntry.queries("q191_entity_clusters")(spark, sfDir)
      .collect()
    assert(census.map(_.getAs[Long]("n_entities")).sum == nodes.size,
      "every matched entity must land in exactly one cluster")
    census.foreach { r =>
      assert(r.getAs[Long]("cluster_size") >= 2L)
      assert(r.getAs[Long]("n_entities") ==
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    }
  }

  test("q192 Kaplan-Meier: survival is a monotone non-increasing curve in (0,1]") {
    val rows = SparkEntry.queries("q192_kaplan_meier")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val surv = rows.sortBy(_.getAs[Long]("gap_days"))
      .map(_.getAs[Double]("survival")).toSeq
    assert(surv.head <= 1.0 && surv.forall(s => s > 0.0 && s <= 1.0))
    surv.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, "survival must be non-increasing")
      case _ => ()
    }
    // at-risk counts strictly decrease across event days
    val risk = rows.sortBy(_.getAs[Long]("gap_days"))
      .map(_.getAs[Long]("n_at_risk")).toSeq
    risk.sliding(2).foreach {
      case Seq(a, b) => assert(b < a)
      case _ => ()
    }
  }

  test("q193 as-of freshness: per-type shares partition to 1, classes reconcile with q39") {
    val rows = SparkEntry.queries("q193_asof_freshness")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val total = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(total - 1.0) < 1e-9, s"$t shares sum to $total")
    }
    // unmatched count must equal q39's NULL-match rows (same join contract)
    val unmatched = rows.filter(_.getAs[String]("match_class") == "unmatched")
      .map(_.getAs[Long]("n_events")).sum
    val q39Nulls = SparkEntry.queries("q39_events_asof_orders")(spark, sfDir)
      .filter("o_orderkey IS NULL").count()
    assert(unmatched == q39Nulls)
  }

  test("q194 circadian profile: R in [0,1], mean hour on the clock, counts reconcile") {
    val rows = SparkEntry.queries("q194_circadian_profile")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val totalEvents = rows.map(_.getAs[Long]("n_events")).sum
    val rawCount = graft.queries.Kpis.eventsTable(spark, sfDir).count()
    assert(totalEvents == rawCount)
    rows.foreach { r =>
      val rr = r.getAs[Double]("resultant_r")
      val mh = r.getAs[Double]("mean_hour")
      assert(rr >= 0.0 && rr <= 1.0)
      assert(mh >= 0.0 && mh < 24.0)
    }
  }

  test("q195 TF-IDF pair cosine: one row per planted pair, high-but-below-1 similarity") {
    val rows = SparkEntry.queries("q195_tfidf_pair_cosine")(spark, sfDir)
      .collect()
    val planted = graft.queries.Kpis.table(spark, sfDir, "documents")
      .filter("doc_id % 10 = 0").count()
    assert(rows.length == planted, "every planted clone pair must be scored")
    rows.foreach { r =>
      val c = r.getAs[Double]("cosine")
      // strictly below 1 (the 3 appended tokens are RARE → high idf, so
      // they weigh heavily on short fixture docs; no absolute floor)
      assert(c > 0.0 && c < 1.0,
        s"doc ${r.getAs[Long]("doc_id")}: clone cosine $c out of (0,1)")
      assert(r.getAs[Long]("n_shared_terms") > 0L)
    }
    val mean = rows.map(_.getAs[Double]("cosine")).sum / rows.length
    assert(mean > 0.3, s"clone pairs should still dominate idf noise: mean $mean")
  }

  test("q196 equi-depth histogram: depths differ by at most 1, boundaries ordered") {
    val rows = SparkEntry.queries("q196_equidepth_hist")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("bin"))
    assert(rows.length == 10)
    val counts = rows.map(_.getAs[Long]("n_rows"))
    assert(counts.max - counts.min <= 1L, s"equi-depth violated: ${counts.toSeq}")
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Double]("hi") <= hi.getAs[Double]("lo"),
          "bin boundaries must be non-overlapping and ordered")
      case _ => ()
    }
    rows.foreach(r => assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
  }

  test("q197 cross-correlation: 11 lags, r bounded, lag accounting correct") {
    val rows = SparkEntry.queries("q197_crosscorr")(spark, sfDir).collect()
    assert(rows.length == 11)
    val n0 = rows.find(_.getAs[Long]("lag") == 0L).get.getAs[Long]("n_pairs")
    rows.foreach { r =>
      val x = r.getAs[Double]("xcorr")
      assert(x >= -1.0 && x <= 1.0)
      val k = math.abs(r.getAs[Long]("lag"))
      assert(r.getAs[Long]("n_pairs") == n0 - k,
        "each lag k loses exactly k aligned days")
    }
  }

  test("q198 similarity histogram: clone bands populated, census counts positive") {
    val rows = SparkEntry.queries("q198_similarity_histogram")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(b >= 6 && b <= 19, "buckets start at the 0.3 floor")
      assert(r.getAs[Double]("bucket_lo") == b / 20.0)
      assert(r.getAs[Long]("n_pairs") > 0L)
    }
    // the planted clone pairs (3-token tails) must land in the HIGH bands
    assert(rows.exists(_.getAs[Int]("bucket") >= 14),
      "near-clone mass missing from the high-similarity bands")
  }

  test("q199 discount elasticity: one row per traded brand, finite fits") {
    val rows = SparkEntry.queries("q199_discount_elasticity")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sales") > 0L)
      assert(!r.getAs[Double]("slope_qty_per_discount").isNaN)
      assert(!r.getAs[Double]("intercept_qty").isNaN)
    }
  }

  test("q200 bounce rate: session accounting reconciles with q34") {
    val rows = SparkEntry.queries("q200_bounce_rate")(spark, sfDir).collect()
    val totalSessions = rows.map(_.getAs[Long]("n_sessions")).sum
    val q34Sessions = SparkEntry.queries("q34_sessions")(spark, sfDir).count()
    assert(totalSessions == q34Sessions,
      "bounce census must partition exactly q34's session set")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bounces") <= r.getAs[Long]("n_sessions"))
      val b = r.getAs[Double]("bounce_rate")
      assert(b >= 0.0 && b <= 1.0)
    }
  }

  test("q201 trajectory census: sign classes partition the repeat customers") {
    val rows = SparkEntry.queries("q201_trajectory_census")(spark, sfDir)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_growing") + r.getAs[Long]("n_shrinking") +
        r.getAs[Long]("n_flat") == r.getAs[Long]("n_repeat_customers"),
        "every >=3-order customer gets exactly one sign class")
      val g = r.getAs[Double]("growing_share")
      assert(g >= 0.0 && g <= 1.0)
    }
  }

  test("q202 dead stock: shares bounded, dead never exceeds catalog, anti-join plan") {
    val rows = SparkEntry.queries("q202_dead_stock")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dead") <= r.getAs[Long]("n_parts"))
      val s = r.getAs[Double]("dead_share")
      assert(s > 0.0 && s <= 1.0)
      assert(r.getAs[Double]("dead_value") > 0.0)
    }
    val plan = SparkEntry.queries("q202_dead_stock")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), "dead-stock detection must be an anti-join")
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      "the recency cutoff must reach the lineitem scan")
  }

  test("new query plans: no cartesian product outside broadcast cert joins") {
    for (q <- Seq("q169_cusum_changepoint", "q177_ar1_forecast",
        "q174_nation_gini", "q171_scd2_asof", "q175_fd_audit",
        "q170_readability")) {
      val s = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!s.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }
}
