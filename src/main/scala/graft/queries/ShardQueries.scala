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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q297_shard_stability" -> (q297ShardStability _))

  def oracles: Map[String, String] = Map(
    "q297_shard_stability" -> q297Sql)
}
