package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{md5Hash60, md5Hash60Sql}

/** Shard-assignment audits — the placement layer under every distributed
  * store this library writes to (warehouse buckets, IVF cells, dedup
  * stores). Reference provenance: the reference shards nothing (single
  * Postgres/MinIO, `dags/process_sales_dags.py`); at 100 TB placement
  * policy IS a query-able property, and the cost of getting it wrong
  * (full-corpus reshuffles on every topology change) is the single
  * largest avoidable data movement a deployment pays.
  */
object ShardQueries {

  // --------------------------------------------------------------- q297
  /** Rendezvous (HRW) vs mod-N sharding stability under ONE node
    * addition (8 → 9 nodes): for every document, its shard under both
    * policies before and after, aggregated to the moved-document share.
    * Theory says mod-N moves ≈ N/(N+1) ≈ 89% of all keys (nearly every
    * residue changes) while rendezvous moves exactly the keys whose new
    * node wins the hash race, E[share] = 1/(N+1) ≈ 11% — this query
    * measures both on the real corpus, turning "use consistent hashing"
    * into an audited number: at 100 TB the difference is ~78 TB of
    * avoided movement per scale-out step.
    *
    * Exactness: shards derive from the shared md5-60bit grid
    * ([[md5Hash60]], same digest both engines); moved flags and counts
    * are integers; the two shares are single integer divisions.
    *
    * Scale shape: ZERO pre-aggregation shuffle — the HRW winner is an
    * expression-side `array_max` over a 9-entry struct array (no
    * explode, no per-node row blow-up; the oracle spells the same
    * argmax relationally), then one map-combinable global agg. */
  def q297ShardStability(spark: SparkSession, dir: String): DataFrame = {
    val h = md5Hash60(col("doc_id").cast("string"))
    def hrwBest(nNodes: Int): Column =
      array_max(array((0 until nNodes).map(n =>
        struct(
          md5Hash60(concat(col("doc_id").cast("string"), lit(s"|node$n")))
            .as("h"),
          lit(n.toLong).as("n"))): _*)).getField("n")
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .select(
        (h % lit(8L) =!= h % lit(9L)).cast("long").as("mod_moved"),
        (hrwBest(8) =!= hrwBest(9)).cast("long").as("hrw_moved"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("mod_moved")).as("mod_moved"),
        sum(col("hrw_moved")).as("hrw_moved"))
      .select(col("n_docs"), col("mod_moved"), col("hrw_moved"),
        (col("mod_moved").cast("double") / col("n_docs").cast("double"))
          .as("mod_share"),
        (col("hrw_moved").cast("double") / col("n_docs").cast("double"))
          .as("hrw_share"))
  }

  val q297Sql: String = {
    def nh = md5Hash60Sql(
      "CAST(doc_id AS VARCHAR) || '|node' || CAST(n AS VARCHAR)")
    s"""WITH docs AS (SELECT doc_id FROM documents),
      |base AS (
      |  SELECT doc_id, ${md5Hash60Sql("CAST(doc_id AS VARCHAR)")} AS h
      |  FROM docs),
      |nodes8 AS (SELECT * FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7))
      |  v(n)),
      |nodes9 AS (SELECT * FROM
      |  (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8)) v(n)),
      |a8 AS (
      |  SELECT doc_id, arg_max(n, $nh) AS best
      |  FROM docs CROSS JOIN nodes8 GROUP BY doc_id),
      |a9 AS (
      |  SELECT doc_id, arg_max(n, $nh) AS best
      |  FROM docs CROSS JOIN nodes9 GROUP BY doc_id),
      |flags AS (
      |  SELECT CASE WHEN b.h % 8 <> b.h % 9 THEN 1 ELSE 0 END AS mod_moved,
      |    CASE WHEN a8.best <> a9.best THEN 1 ELSE 0 END AS hrw_moved
      |  FROM base b JOIN a8 USING (doc_id) JOIN a9 USING (doc_id))
      |SELECT COUNT(*) AS n_docs,
      |  CAST(SUM(mod_moved) AS BIGINT) AS mod_moved,
      |  CAST(SUM(hrw_moved) AS BIGINT) AS hrw_moved,
      |  CAST(SUM(mod_moved) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS mod_share,
      |  CAST(SUM(hrw_moved) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS hrw_share
      |FROM flags""".stripMargin
  }

  // --------------------------------------------------------------- q355
  /** Z-order vs linear file-layout skip audit — the lakehouse
    * OPTIMIZE ZORDER decision as an audited number. Lineitem rows are
    * assigned to 64 equal "files" under three layouts — sorted by ship
    * date, sorted by part key, and sorted by the Morton z-value
    * interleaving the two 16-bit dimensions — then every file's
    * (min, max) zone map of BOTH dimensions is probed by two realistic
    * workloads: one month-range predicate per distinct ship month, and
    * 32 equal-width part-key ranges. Reported per layout: average
    * files a date probe must scan, average for a part probe, and the
    * combined mean — certifying the z-order trade (each single
    * dimension a bit worse than its dedicated sort, the mixed workload
    * far better than either's worst case).
    *
    * Exactness: day indices, part keys, bit-interleaved z-values, file
    * assignments (NTILE arithmetic on exact global rank), zone bounds,
    * and overlap counts are all integers; the three averages are
    * single int/int divisions snapped to 6 dp.
    *
    * Scale shape: file assignment is [[graft.operators.RangeRank
    * .withNtile]] — range shuffle + broadcast offsets, never a
    * single-partition window — once per layout over the persisted
    * z-augmented fact (the z-value itself is a per-row 16-step integer
    * fold, map-side); zone maps collapse to 64 rows per layout and the
    * probe joins run on broadcast censuses (≤84 months, 32 ranges).
    * The 16-bit dimension normalization is the fixture's domain
    * (days < 2^13, part keys < 2^15 at sf0.1); production would
    * min-max-rescale each dimension to 16 bits first. */
  def q355ZorderSkip(spark: SparkSession, dir: String): DataFrame = {
    val epoch = lit(java.sql.Date.valueOf("1992-01-01"))
    val li = Kpis.table(spark, dir, "lineitem")
      .select(datediff(col("l_shipdate"), epoch).as("d"),
        col("l_partkey").cast("int").as("p"),
        col("l_orderkey"), col("l_linenumber"))
    val base = li.withColumn("z", expr(
      """aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, b) -> acc
        |  + shiftleft(CAST(shiftright(d, b) & 1 AS BIGINT), 2 * b + 1)
        |  + shiftleft(CAST(shiftright(p, b) & 1 AS BIGINT), 2 * b))"""
        .stripMargin))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def zoneMaps(name: String, keys: Seq[org.apache.spark.sql.Column]) =
      graft.operators.RangeRank.withNtile(base, "f", 64, keys)
        .groupBy(col("f"))
        .agg(min(col("d")).as("min_d"), max(col("d")).as("max_d"),
          min(col("p")).as("min_p"), max(col("p")).as("max_p"))
        .withColumn("layout", lit(name))
    val zm = zoneMaps("1_by_date",
        Seq(col("d"), col("p"), col("l_orderkey"), col("l_linenumber")))
      .unionAll(zoneMaps("2_by_part",
        Seq(col("p"), col("d"), col("l_orderkey"), col("l_linenumber"))))
      .unionAll(zoneMaps("3_zorder",
        Seq(col("z"), col("l_orderkey"), col("l_linenumber"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dateProbes = Kpis.table(spark, dir, "lineitem")
      .select(trunc(col("l_shipdate"), "MM").as("mon")).distinct()
      .select(datediff(col("mon"), epoch).as("lo"),
        datediff(last_day(col("mon")), epoch).as("hi"))
    val partProbes = Kpis.table(spark, dir, "part")
      .agg(min(col("p_partkey")).cast("int").as("pmin"),
        max(col("p_partkey")).cast("int").as("pmax"))
      .select(col("pmin"), col("pmax"),
        expr("(pmax - pmin) div 32 + 1").as("w"))
      .select(explode(sequence(lit(0), lit(31))).as("k"),
        col("pmin"), col("pmax"), col("w"))
      .select((col("pmin") + col("k") * col("w")).as("lo"),
        least(col("pmin") + (col("k") + 1) * col("w") - 1,
          col("pmax")).as("hi"))
    def scannedPairs(probes: DataFrame, lo: String, hi: String,
        out: String) =
      zm.join(broadcast(probes),
          col(s"min_$lo") <= col("hi") && col(s"max_$lo") >= col("lo"))
        .groupBy(col("layout")).agg(count(lit(1)).as(out))
    val dp = scannedPairs(dateProbes, "d", "d", "dpairs")
    val pp = scannedPairs(partProbes, "p", "p", "ppairs")
    val out = graft.plans.Eager.ckpt(
      zm.groupBy(col("layout")).agg(count(lit(1)).as("n_files"))
        .join(dp, "layout").join(pp, "layout")
        .crossJoin(broadcast(dateProbes.agg(count(lit(1)).as("n_dp"))))
        .crossJoin(broadcast(partProbes.agg(count(lit(1)).as("n_pp"))))
        .select(col("layout"), col("n_files"),
          (round(col("dpairs").cast("double") / col("n_dp").cast("double"),
            6) + lit(0.0)).as("avg_files_date_probe"),
          (round(col("ppairs").cast("double") / col("n_pp").cast("double"),
            6) + lit(0.0)).as("avg_files_part_probe"),
          (round((col("dpairs").cast("double") / col("n_dp").cast("double")
            + col("ppairs").cast("double") / col("n_pp").cast("double"))
            / 2.0, 6) + lit(0.0)).as("avg_files_combined"))
        .orderBy("layout"))
    zm.unpersist(); base.unpersist()
    out
  }

  val q355Sql: String = {
    val z =
      """CAST(list_sum(list_transform(range(0, 16), b ->
        |    (CAST((d >> CAST(b AS INTEGER)) & 1 AS BIGINT)
        |      << CAST(2 * b + 1 AS INTEGER))
        |    + (CAST((p >> CAST(b AS INTEGER)) & 1 AS BIGINT)
        |      << CAST(2 * b AS INTEGER)))) AS BIGINT)""".stripMargin
    s"""WITH base AS (
      |  SELECT datediff('day', DATE '1992-01-01', l_shipdate) AS d,
      |    CAST(l_partkey AS INTEGER) AS p, l_orderkey, l_linenumber
      |  FROM lineitem),
      |bz AS MATERIALIZED (SELECT *, $z AS z FROM base),
      |t1 AS (SELECT d, p,
      |  NTILE(64) OVER (ORDER BY d, p, l_orderkey, l_linenumber) AS f
      |  FROM bz),
      |t2 AS (SELECT d, p,
      |  NTILE(64) OVER (ORDER BY p, d, l_orderkey, l_linenumber) AS f
      |  FROM bz),
      |t3 AS (SELECT d, p,
      |  NTILE(64) OVER (ORDER BY z, l_orderkey, l_linenumber) AS f
      |  FROM bz),
      |zm AS MATERIALIZED (
      |  SELECT '1_by_date' AS layout, f, MIN(d) AS min_d, MAX(d) AS max_d,
      |    MIN(p) AS min_p, MAX(p) AS max_p FROM t1 GROUP BY f
      |  UNION ALL
      |  SELECT '2_by_part', f, MIN(d), MAX(d), MIN(p), MAX(p)
      |  FROM t2 GROUP BY f
      |  UNION ALL
      |  SELECT '3_zorder', f, MIN(d), MAX(d), MIN(p), MAX(p)
      |  FROM t3 GROUP BY f),
      |dprobes AS MATERIALIZED (
      |  SELECT datediff('day', DATE '1992-01-01', mon) AS lo,
      |    datediff('day', DATE '1992-01-01', last_day(mon)) AS hi
      |  FROM (SELECT DISTINCT date_trunc('month', l_shipdate) AS mon
      |        FROM lineitem)),
      |pbounds AS (
      |  SELECT CAST(MIN(p_partkey) AS INTEGER) AS pmin,
      |    CAST(MAX(p_partkey) AS INTEGER) AS pmax,
      |    (CAST(MAX(p_partkey) AS INTEGER)
      |      - CAST(MIN(p_partkey) AS INTEGER)) // 32 + 1 AS w
      |  FROM part),
      |pprobes AS MATERIALIZED (
      |  SELECT pmin + k * w AS lo,
      |    least(pmin + (k + 1) * w - 1, pmax) AS hi
      |  FROM pbounds, UNNEST(range(0, 32)) AS t(k)),
      |dp AS (
      |  SELECT layout, COUNT(*) AS dpairs
      |  FROM zm JOIN dprobes pr ON zm.min_d <= pr.hi AND zm.max_d >= pr.lo
      |  GROUP BY layout),
      |pp AS (
      |  SELECT layout, COUNT(*) AS ppairs
      |  FROM zm JOIN pprobes pr ON zm.min_p <= pr.hi AND zm.max_p >= pr.lo
      |  GROUP BY layout),
      |nf AS (SELECT layout, COUNT(*) AS n_files FROM zm GROUP BY layout),
      |nd AS (SELECT COUNT(*) AS n_dp FROM dprobes),
      |np AS (SELECT COUNT(*) AS n_pp FROM pprobes)
      |SELECT nf.layout, nf.n_files,
      |  round(CAST(dpairs AS DOUBLE) / CAST(n_dp AS DOUBLE), 6) + 0.0
      |    AS avg_files_date_probe,
      |  round(CAST(ppairs AS DOUBLE) / CAST(n_pp AS DOUBLE), 6) + 0.0
      |    AS avg_files_part_probe,
      |  round((CAST(dpairs AS DOUBLE) / CAST(n_dp AS DOUBLE)
      |    + CAST(ppairs AS DOUBLE) / CAST(n_pp AS DOUBLE)) / 2.0, 6) + 0.0
      |    AS avg_files_combined
      |FROM nf JOIN dp ON nf.layout = dp.layout
      |JOIN pp ON nf.layout = pp.layout
      |CROSS JOIN nd CROSS JOIN np
      |ORDER BY nf.layout""".stripMargin
  }

  // --------------------------------------------------------------- q359
  /** First-fit-decreasing compaction plan for the small-files problem —
    * the OPTIMIZE/compaction DECISION beside [[graft.sink.Warehouse
    * .compactDay]]'s physical execution: every incremental lake
    * accumulates one file per ingest tick (here: one "file" per order
    * day, its row count the size), and the maintenance pass must pack
    * them into target-capacity files. FFD — sort sizes descending,
    * place each into the first bin that fits — is the classic
    * guarantee (≤ 11/9·OPT + 1 bins) and runs here as a RELATIONAL
    * FOLD over the size census (the q354 convention), with the packing
    * verdict beside the information-theoretic lower bound
    * ⌈total/capacity⌉ so the plan's overhead is an audited number.
    *
    * Exactness: sizes, capacity (4× the largest file — data-derived,
    * scale-invariant), bin loads, and bounds are all integers; the
    * only double is the 6-dp fill fraction.
    *
    * Scale shape: one map-side-combinable (day, count) census is the
    * only fact-scale pass; the descending sort and the FFD fold run on
    * the date-domain-bounded census array (≤ |days| elements) inside
    * one row. First-fit scans bins per file — O(files × bins) integer
    * lambda steps, date-domain-bounded, zero shuffle. */
  def q359CompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val files = Kpis.table(spark, dir, "orders")
      .groupBy(col("o_orderdate").as("day")).agg(count(lit(1)).as("c"))
    val census = files.agg(
        sort_array(collect_list(struct((-col("c")).as("nc"), col("day"))))
          .as("sf"),
        count(lit(1)).as("n_files_before"),
        sum(col("c")).as("total_rows"),
        (max(col("c")) * lit(4L)).as("cap"))
      .select(transform(col("sf"), s => (-s.getField("nc")).cast("long"))
        .as("sizes"), col("n_files_before"), col("total_rows"), col("cap"))
    val bins = expr(
      """aggregate(sizes, CAST(array() AS ARRAY<BIGINT>),
        |  (acc, x) -> CASE
        |    WHEN size(acc) = 0 THEN array(x)
        |    WHEN array_min(filter(sequence(1, size(acc)),
        |           j -> element_at(acc, j) + x <= cap)) IS NULL
        |      THEN concat(acc, array(x))
        |    ELSE transform(sequence(1, size(acc)),
        |      j -> CASE WHEN j = array_min(filter(sequence(1, size(acc)),
        |             k -> element_at(acc, k) + x <= cap))
        |           THEN element_at(acc, j) + x
        |           ELSE element_at(acc, j) END)
        |  END)""".stripMargin)
    census.select(col("n_files_before"), col("total_rows"), col("cap"),
        bins.as("bins"))
      .select(col("n_files_before"), col("total_rows"),
        col("cap").as("capacity"),
        size(col("bins")).cast("long").as("n_bins_after"),
        expr("(total_rows + cap - 1) div cap").as("lb_bins"),
        array_max(col("bins")).as("max_bin_rows"),
        array_min(col("bins")).as("min_bin_rows"),
        (round(col("total_rows").cast("double") /
          (size(col("bins")).cast("double") * col("cap").cast("double")),
          6) + lit(0.0)).as("fill_frac"))
  }

  val q359Sql: String =
    """WITH files AS (
      |  SELECT o_orderdate AS day, COUNT(*) AS c FROM orders GROUP BY 1),
      |census AS (
      |  SELECT list_transform(list_sort(list({'nc': -c, 'day': day})),
      |      s -> CAST(-s.nc AS BIGINT)) AS sizes,
      |    COUNT(*) AS n_files_before,
      |    CAST(SUM(c) AS BIGINT) AS total_rows,
      |    CAST(MAX(c) * 4 AS BIGINT) AS cap
      |  FROM files),
      |packed AS (
      |  SELECT *,
      |    list_reduce(
      |      [[]::BIGINT[]] || list_transform(sizes, x -> [x]),
      |      (acc, xx) -> CASE
      |        WHEN list_min(list_filter(range(1, len(acc) + 1),
      |               j -> acc[CAST(j AS INTEGER)] + xx[1] <= cap)) IS NULL
      |          THEN acc || [xx[1]]
      |        ELSE list_transform(range(1, len(acc) + 1),
      |          j -> CASE WHEN j = list_min(list_filter(
      |                 range(1, len(acc) + 1),
      |                 k -> acc[CAST(k AS INTEGER)] + xx[1] <= cap))
      |               THEN acc[CAST(j AS INTEGER)] + xx[1]
      |               ELSE acc[CAST(j AS INTEGER)] END)
      |      END) AS bins
      |  FROM census)
      |SELECT n_files_before, total_rows, cap AS capacity,
      |  CAST(len(bins) AS BIGINT) AS n_bins_after,
      |  (total_rows + cap - 1) // cap AS lb_bins,
      |  CAST(list_max(bins) AS BIGINT) AS max_bin_rows,
      |  CAST(list_min(bins) AS BIGINT) AS min_bin_rows,
      |  round(CAST(total_rows AS DOUBLE)
      |    / (CAST(len(bins) AS DOUBLE) * CAST(cap AS DOUBLE)), 6) + 0.0
      |    AS fill_frac
      |FROM packed""".stripMargin

  // --------------------------------------------------------------- q361
  /** Layout-drift / re-OPTIMIZE trigger audit — the third leg of the
    * storage-maintenance stool (q355 chooses the layout, q359 plans the
    * compaction, this decides WHEN to re-sort): a z-ordered table
    * degrades as appends land in arrival order, and the decision to pay
    * a full re-sort should be a measured number, not a hunch. The first
    * 75% of lineitem (by order key — the "historical ingest") is
    * z-ordered into 48 files; the last 25% ("recent appends") lands in
    * 16 arrival-order files. Both probe workloads from q355 run against
    * three states — the pristine z-order of the base alone, the drifted
    * base+tail table, and the re-optimized full re-sort into 64 files —
    * so the drift penalty and the re-sort payoff are read side by side.
    *
    * Exactness: q355's machinery verbatim (integer z-values, NTILE on
    * exact ranks, integer zone maps and overlap counts; 6-dp snapped
    * averages).
    *
    * Scale shape: as q355 — RangeRank range-shuffles per layout build
    * are the whole cost; zone maps collapse to ≤64 rows per state and
    * probes are broadcast censuses. The 75/25 split is one pushed-down
    * predicate on the already-scanned fact. */
  def q361LayoutDrift(spark: SparkSession, dir: String): DataFrame = {
    val epoch = lit(java.sql.Date.valueOf("1992-01-01"))
    val li = Kpis.table(spark, dir, "lineitem")
      .select(datediff(col("l_shipdate"), epoch).as("d"),
        col("l_partkey").cast("int").as("p"),
        col("l_orderkey"), col("l_linenumber"))
    val cut = li.agg(
      expr("(min(l_orderkey) * 25 + max(l_orderkey) * 75) div 100")
        .as("cutk"))
    val base = li.crossJoin(broadcast(cut))
      .withColumn("z", expr(
        """aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, b) -> acc
          |  + shiftleft(CAST(shiftright(d, b) & 1 AS BIGINT), 2 * b + 1)
          |  + shiftleft(CAST(shiftright(p, b) & 1 AS BIGINT), 2 * b))"""
          .stripMargin))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def zoneMaps(df: DataFrame, name: String, nFiles: Int,
        keys: Seq[org.apache.spark.sql.Column], fileOffset: Int = 0) =
      graft.operators.RangeRank.withNtile(df, "f", nFiles, keys)
        .groupBy((col("f") + lit(fileOffset)).as("f"))
        .agg(min(col("d")).as("min_d"), max(col("d")).as("max_d"),
          min(col("p")).as("min_p"), max(col("p")).as("max_p"))
        .withColumn("layout", lit(name))
    val zKeys = Seq(col("z"), col("l_orderkey"), col("l_linenumber"))
    val arrivalKeys = Seq(col("l_orderkey"), col("l_linenumber"))
    val pristine = zoneMaps(base.filter(col("l_orderkey") <= col("cutk")),
      "1_pristine_base", 48, zKeys)
    val drifted = pristine
      .withColumn("layout", lit("2_drifted_appends"))
      .unionAll(zoneMaps(base.filter(col("l_orderkey") > col("cutk")),
        "2_drifted_appends", 16, arrivalKeys, fileOffset = 48))
    val reopt = zoneMaps(base, "3_reoptimized", 64, zKeys)
    val zm = pristine.unionAll(drifted).unionAll(reopt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dateProbes = Kpis.table(spark, dir, "lineitem")
      .select(trunc(col("l_shipdate"), "MM").as("mon")).distinct()
      .select(datediff(col("mon"), epoch).as("lo"),
        datediff(last_day(col("mon")), epoch).as("hi"))
    val partProbes = Kpis.table(spark, dir, "part")
      .agg(min(col("p_partkey")).cast("int").as("pmin"),
        max(col("p_partkey")).cast("int").as("pmax"))
      .select(col("pmin"), col("pmax"),
        expr("(pmax - pmin) div 32 + 1").as("w"))
      .select(explode(sequence(lit(0), lit(31))).as("k"),
        col("pmin"), col("pmax"), col("w"))
      .select((col("pmin") + col("k") * col("w")).as("lo"),
        least(col("pmin") + (col("k") + 1) * col("w") - 1,
          col("pmax")).as("hi"))
    def pairs(probes: DataFrame, dim: String, out: String) =
      zm.join(broadcast(probes),
          col(s"min_$dim") <= col("hi") && col(s"max_$dim") >= col("lo"))
        .groupBy(col("layout")).agg(count(lit(1)).as(out))
    val out = graft.plans.Eager.ckpt(
      zm.groupBy(col("layout")).agg(count(lit(1)).as("n_files"))
        .join(pairs(dateProbes, "d", "dpairs"), "layout")
        .join(pairs(partProbes, "p", "ppairs"), "layout")
        .crossJoin(broadcast(dateProbes.agg(count(lit(1)).as("n_dp"))))
        .crossJoin(broadcast(partProbes.agg(count(lit(1)).as("n_pp"))))
        .select(col("layout"), col("n_files"),
          (round(col("dpairs").cast("double") / col("n_dp").cast("double"),
            6) + lit(0.0)).as("avg_files_date_probe"),
          (round(col("ppairs").cast("double") / col("n_pp").cast("double"),
            6) + lit(0.0)).as("avg_files_part_probe"),
          (round((col("dpairs").cast("double") / col("n_dp").cast("double")
            + col("ppairs").cast("double") / col("n_pp").cast("double"))
            / 2.0, 6) + lit(0.0)).as("avg_files_combined"))
        .orderBy("layout"))
    zm.unpersist(); base.unpersist()
    out
  }

  val q361Sql: String = {
    val z =
      """CAST(list_sum(list_transform(range(0, 16), b ->
        |    (CAST((d >> CAST(b AS INTEGER)) & 1 AS BIGINT)
        |      << CAST(2 * b + 1 AS INTEGER))
        |    + (CAST((p >> CAST(b AS INTEGER)) & 1 AS BIGINT)
        |      << CAST(2 * b AS INTEGER)))) AS BIGINT)""".stripMargin
    s"""WITH li AS (
      |  SELECT datediff('day', DATE '1992-01-01', l_shipdate) AS d,
      |    CAST(l_partkey AS INTEGER) AS p, l_orderkey, l_linenumber
      |  FROM lineitem),
      |cut AS (
      |  SELECT (MIN(l_orderkey) * 25 + MAX(l_orderkey) * 75) // 100
      |    AS cutk
      |  FROM li),
      |bz AS MATERIALIZED (SELECT li.*, $z AS z FROM li),
      |pristine AS (
      |  SELECT '1_pristine_base' AS layout, f, MIN(d) AS min_d,
      |    MAX(d) AS max_d, MIN(p) AS min_p, MAX(p) AS max_p
      |  FROM (SELECT d, p,
      |          NTILE(48) OVER (ORDER BY z, l_orderkey, l_linenumber) AS f
      |        FROM bz, cut WHERE l_orderkey <= cutk)
      |  GROUP BY f),
      |drifted AS (
      |  SELECT '2_drifted_appends' AS layout, f, min_d, max_d, min_p, max_p
      |  FROM pristine
      |  UNION ALL
      |  SELECT '2_drifted_appends', f + 48, MIN(d), MAX(d), MIN(p), MAX(p)
      |  FROM (SELECT d, p,
      |          NTILE(16) OVER (ORDER BY l_orderkey, l_linenumber) AS f
      |        FROM bz, cut WHERE l_orderkey > cutk)
      |  GROUP BY f),
      |reopt AS (
      |  SELECT '3_reoptimized' AS layout, f, MIN(d), MAX(d), MIN(p), MAX(p)
      |  FROM (SELECT d, p,
      |          NTILE(64) OVER (ORDER BY z, l_orderkey, l_linenumber) AS f
      |        FROM bz)
      |  GROUP BY f),
      |zm AS MATERIALIZED (
      |  SELECT * FROM pristine UNION ALL SELECT * FROM drifted
      |  UNION ALL SELECT * FROM reopt),
      |dprobes AS MATERIALIZED (
      |  SELECT datediff('day', DATE '1992-01-01', mon) AS lo,
      |    datediff('day', DATE '1992-01-01', last_day(mon)) AS hi
      |  FROM (SELECT DISTINCT date_trunc('month', l_shipdate) AS mon
      |        FROM lineitem)),
      |pbounds AS (
      |  SELECT CAST(MIN(p_partkey) AS INTEGER) AS pmin,
      |    CAST(MAX(p_partkey) AS INTEGER) AS pmax,
      |    (CAST(MAX(p_partkey) AS INTEGER)
      |      - CAST(MIN(p_partkey) AS INTEGER)) // 32 + 1 AS w
      |  FROM part),
      |pprobes AS MATERIALIZED (
      |  SELECT pmin + k * w AS lo,
      |    least(pmin + (k + 1) * w - 1, pmax) AS hi
      |  FROM pbounds, UNNEST(range(0, 32)) AS t(k)),
      |dp AS (
      |  SELECT layout, COUNT(*) AS dpairs
      |  FROM zm JOIN dprobes pr ON zm.min_d <= pr.hi AND zm.max_d >= pr.lo
      |  GROUP BY layout),
      |pp AS (
      |  SELECT layout, COUNT(*) AS ppairs
      |  FROM zm JOIN pprobes pr ON zm.min_p <= pr.hi AND zm.max_p >= pr.lo
      |  GROUP BY layout),
      |nf AS (SELECT layout, COUNT(*) AS n_files FROM zm GROUP BY layout),
      |nd AS (SELECT COUNT(*) AS n_dp FROM dprobes),
      |np AS (SELECT COUNT(*) AS n_pp FROM pprobes)
      |SELECT nf.layout, nf.n_files,
      |  round(CAST(dpairs AS DOUBLE) / CAST(n_dp AS DOUBLE), 6) + 0.0
      |    AS avg_files_date_probe,
      |  round(CAST(ppairs AS DOUBLE) / CAST(n_pp AS DOUBLE), 6) + 0.0
      |    AS avg_files_part_probe,
      |  round((CAST(dpairs AS DOUBLE) / CAST(n_dp AS DOUBLE)
      |    + CAST(ppairs AS DOUBLE) / CAST(n_pp AS DOUBLE)) / 2.0, 6) + 0.0
      |    AS avg_files_combined
      |FROM nf JOIN dp ON nf.layout = dp.layout
      |JOIN pp ON nf.layout = pp.layout
      |CROSS JOIN nd CROSS JOIN np
      |ORDER BY nf.layout""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q297_shard_stability" -> (q297ShardStability _),
    "q355_zorder_skip" -> (q355ZorderSkip _),
    "q359_compaction_plan" -> (q359CompactionPlan _),
    "q361_layout_drift" -> (q361LayoutDrift _))

  def oracles: Map[String, String] = Map(
    "q297_shard_stability" -> q297Sql,
    "q355_zorder_skip" -> q355Sql,
    "q359_compaction_plan" -> q359Sql,
    "q361_layout_drift" -> q361Sql)
}
