package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Repartition, RepartitionByExpression, Window}
import org.apache.spark.sql.graft.PlanProbe
import org.scalatest.funsuite.AnyFunSuite

/** Window guardrails (VERDICT r11 #3): every registered query whose plan
  * contains a GLOBAL window — a `Window` node with an empty partitionSpec,
  * which Spark executes on ONE partition — is enforced here as an
  * invariant, not a prose rationale: the window's exact input row count at
  * the sf0.1 stress fixture must stay under the entity/census bound.
  *
  * The bound (50k rows) is the dividing line the rationales have always
  * claimed: global windows in this library run over COLLAPSED frames —
  * entity tables (customer 15k, part 20k at sf0.1), value censuses
  * (domain-bounded 4-dp grids), frontier/cell/rank-list tables — never
  * over fact tables (lineitem 600k, events 100k at sf0.1 are both safely
  * above the bound, so a fact-table regression trips the assert).
  *
  * Mechanics: sites are discovered from each query's OPTIMIZED logical
  * plan at sf0.001 (construction is cheap there), pinned against the
  * expected inventory below so a new global window is a conscious,
  * reviewed addition — then each site's child subtree is re-derived at
  * sf0.1 and counted exactly via [[PlanProbe]] (WindowExec exposes no
  * row metric; counting the analyzed child subplan is precise and
  * metric-API-independent). Eagerly-materialized segments (localCheckpoint
  * inside e.g. q50/q152) truncate their internal plans to cached scans, so
  * windows inside them are certified by their own operator specs instead —
  * this guard covers every site visible in the declarative plan.
  */
class WindowGuardSpec extends AnyFunSuite {
  import SparkTestSession._

  private val StressDir = "/root/testdata/sf0.1"
  private val Bound = 50000L

  private def globalWindowChildren(plan: LogicalPlan): Seq[LogicalPlan] =
    plan.collect { case w: Window if w.partitionSpec.isEmpty => w.child }

  /** Explicit single-partition funnels — `repartition(1)` / `coalesce(1)`
    * — in a registered declarative plan (VERDICT r12 #8: the same
    * pin-plus-bound discipline as global windows, mechanically enforced).
    * The pinned inventory is EMPTY and should stay that way: a global
    * window at least carries its census rationale; an explicit 1-partition
    * exchange serializes everything below it with no bound at all. */
  private def singlePartitionSites(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case r: Repartition if r.numPartitions == 1 =>
        if (r.shuffle) "repartition(1)" else "coalesce(1)"
      case r: RepartitionByExpression if r.optNumPartitions.contains(1) =>
        "repartitionByExpression(1)"
    }

  test("global-window inventory is pinned and every site is entity/census-bounded at sf0.1") {
    // Phase 1 (sf0.001): discover which queries carry global windows —
    // and, on the same traversal, any single-partition funnel.
    val singlePart = scala.collection.mutable.ArrayBuffer.empty[String]
    val discovered = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan
        singlePartitionSites(plan).foreach(s => singlePart += s"$name: $s")
        val sites = globalWindowChildren(plan)
        if (sites.isEmpty) None else Some(name -> sites.size)
    }
    assert(singlePart.isEmpty,
      s"single-partition funnels in registered plans (pinned inventory is empty):\n  ${singlePart.mkString("\n  ")}")
    val names = discovered.map(_._1).toSet
    assert(names == PinnedSites,
      s"global-window inventory drifted.\n  discovered: ${names.toSeq.sorted.mkString(", ")}\n" +
        s"  pinned:     ${PinnedSites.toSeq.sorted.mkString(", ")}\n" +
        "A new global window needs a scale rationale + an entry in PinnedSites.")

    // Phase 2 (sf0.1): count the exact input of every site at stress scale.
    val report = discovered.map { case (name, _) =>
      val sites = globalWindowChildren(
        SparkEntry.queries(name)(spark, StressDir).queryExecution.optimizedPlan)
      val counts = sites.map(c => PlanProbe.ofRows(spark, c).count())
      counts.foreach { n =>
        assert(n <= Bound,
          s"$name: global-window input $n rows exceeds entity/census bound $Bound at sf0.1")
      }
      f"$name%-28s sites=${sites.size} maxInput=${counts.max}"
    }
    info(s"${discovered.size} queries with global windows, all bounded at sf0.1:")
    report.foreach(info(_))
  }

  /** The reviewed inventory of queries with at least one global-window
    * site (from a verified discovery run; the test failure message lists
    * the discovered set when this drifts). Adding a global window to any
    * query makes the discovery assert fail until it is listed here —
    * which is the point: the addition must come with a written scale
    * rationale at the site. */
  private val PinnedSites: Set[String] = Set(
    "q4_rolling_7day",       // daily-revenue table: |distinct days|
    "q318_order_backlog",    // boundary-date census: |date domain|+1
    "q319_key_fragmentation", // RangeRank offset prefix: <= #partitions rows
    "q367_conformal_cert",   // RangeRank offset prefix: <= #partitions rows
    "q320_bh_fdr",           // 25-row nation census (rank window)
    "q321_rbo_overlap",      // matched-doc/embedding rank lists + 10-row depth census
    "q322_nelson_aalen",     // gap-day census (date-range-bounded), as q192
    "q324_linenum_audit",    // 3-row class census
    "q325_kruskal_wallis",   // 50-row quantity value census (q203 grid)
    "q329_median_bootstrap", // observed-median scan: 50-row value census
    "q336_chained_index",    // chaining window: |months| census
    "q74_dod_growth",        // daily-revenue table
    "q97_vocab_coverage",    // token-frequency census (vocab-bounded)
    "q125_ewma_revenue",     // daily-revenue table
    "q130_autocorr_revenue", // daily-revenue table
    "q131_peak_concurrency", // per-hour event census
    "q134_part_skyline",     // collapsed price frontier: |distinct cost|
    "q137_mutual_info",      // (lang, source) contingency cells
    "q138_benford_audit",    // 9-row leading-digit census
    "q139_rfm_segments",     // RangeRank offset prefix: <= #partitions rows
    "q140_source_lang_kl",   // (source, lang) contingency cells
    "q143_revenue_deciles",  // RangeRank offset prefix: <= #partitions rows
    "q147_heaps_fit",        // per-token first-carrier census
    "q148_seasonal_index",   // monthly cells
    "q150_ks_drift",         // domain-bounded 4-dp value census
    "q151_rrf_fusion",       // scored rank lists
    "q169_cusum_changepoint", // daily-revenue table: |distinct days|
    "q177_ar1_forecast",     // daily-revenue table
    "q178_trimmed_mean",     // RangeRank offsets + 5-row group-prefix table
    "q179_chi2_independence", // (segment, priority) contingency cells
    "q187_psi_drift",        // (source, length-bucket) grid census
    "q192_kaplan_meier",     // gap-day census (date-range-bounded)
    "q347_logrank_test",     // gap-day census (date-range-bounded), as q192
    "q353_wasserstein_matrix", // support-spacing lead: 50-row quantity value census
    "q196_equidepth_hist",   // RangeRank offset prefix: <= #partitions rows
    "q197_crosscorr",        // daily click/purchase census
    "q203_mann_whitney",     // l_quantity value census: 50 rows
    "q206_lift_curve",       // 10-row decile census
    "q207_rolling_median",   // daily-revenue table: |distinct days|
    "q210_record_orders",    // RangeRank offset prefix: <= #partitions rows
    "q215_abc_classification", // RangeRank offset prefix: <= #partitions rows
    "q222_hurst_exponent",   // daily-census day index: |distinct days|
    "q223_exact_percentiles", // RangeRank offset prefix: <= #partitions rows
    "q225_spearman",         // marginal value censuses: 50 + 11 rows
    "q228_token_gini",       // RangeRank offset prefix: <= #partitions rows
    "q231_fd_binning",       // RangeRank offset prefix: <= #partitions rows
    "q239_residual_cells",   // (segment, priority) contingency cells
    "q246_runs_test",        // daily-census rank + lag: |distinct days|
    "q242_vocab_sizing",     // RangeRank offset prefix: <= #partitions rows
    "q255_segment_migration", // RangeRank offset prefix: <= #partitions rows
    "q258_hill_tail_index",  // RangeRank offset prefix: <= #partitions rows
    "q259_entropy_rate",     // (cur,next) transition cells: <= |types|^2
    "q262_hubness_audit",    // RangeRank offset prefix: <= #partitions rows
    "q276_mase_backtest",    // monthly census lag: |distinct months|
    "q278_cell_label_nmi",   // (cell,label) contingency cells: <= 8*|labels|
    "q282_shipment_spread",  // 4-row bucket census
    "q283_dup_by_length",    // RangeRank offset prefix: <= #partitions rows
    "q284_cents_heaping",    // 100-cell cents census
    "q288_max_drawdown",     // daily-revenue table: |distinct days|
    "q291_score_discrimination", // order-count score census: <= |max orders|
    "q293_imr_chart",        // daily order-count census: |distinct days|
    "q296_ndcg_at10",        // matched-doc rank frames (both windows)
    "q342_average_precision", // matched-doc rank frame + 10-row P@k prefix
    "q300_decomposition_strength", // daily-revenue census: |distinct days|
    "q302_mad_outliers",     // daily census median ranks: |distinct days|
    "q303_permutation_entropy", // daily census lead(): |distinct days|
    "q306_abc_xyz",          // RangeRank offset prefix + cv-tercile ntile over |parts|
    "q308_bpe_first_merges", // alphabet² pair census rank
    "q309_dq_scorecard",     // embeds q302's daily-census median ranks
    "q414_topk_federation",  // RangeRank offset prefix: <= #partitions rows
    "q425_federated_idf",    // matched-doc rank frames (q237/q296 class)
    "q428_preference_pairs", // per-lang offset prefix: <= |langs| rows
    "q431_gate_calibration", // per-lang offset prefix: <= |langs| rows
    "q433_mixture_cert",     // per-source offset prefix: <= |sources| rows (+ RangeRank offsets)
    "q439_mixture_delta",    // q433's offset census on the merged index: <= |sources| rows (+ RangeRank offsets)
    "q338_benford_2digit")   // <=90-row two-digit (10..99) census
}
