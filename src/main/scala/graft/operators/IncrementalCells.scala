package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.queries.Kpis

/** Incremental semantic-cell maintenance (VERDICT r12 #5): admit a new
  * embedding batch into an EXISTING cell-partitioned dedup store
  * (q99/q101's [[SemanticCells]]) without re-running Lloyd's.
  *
  * q153 ([[IncrementalIvf]]) split the IVF/PQ index into frozen and
  * appendable halves; this operator applies the same discipline to the
  * SEMANTIC-CELLS store, whose maintenance story was the r12 gap: a new
  * batch previously required re-clustering the merged corpus. The split:
  *
  *   frozen (functions of batch 1 only, never touched by an append):
  *     - the k cell centroids — [[KMeans.lloydCentroids]] trained on the
  *       batch-1 corpus (k ∝ N via the adaptiveK convention at corpus
  *       scale; the registered fixture point k = 16 / 2 rounds);
  *   appendable (one row per new vector, O(|batch|) to extend):
  *     - the cell-membership table — batch-2 vectors cell-assign via ONE
  *       broadcast nearest-centroid pass ([[KMeans.assign]], k rows
  *       broadcast), the assignment DELTA that unions under the stored
  *       batch-1 memberships.
  *
  * q339 proves the maintained store WORKS across batches, mirroring
  * q94/q153's two-batch discipline: batch 1 is `vec_id % 5 != 0` (the
  * clustered corpus), batch 2 is `vec_id % 5 == 0` (the append); each
  * batch-2 vector is verified ONLY against batch-1 members of its
  * assigned cell (cosine ≥ 0.4, q50/q99's threshold) — batch-2 dedup
  * finds its batch-1 near-dups through the frozen cells with zero Lloyd
  * iterations on the merged corpus.
  *
  * Scale posture: per append batch the new work is |batch| broadcast
  * cell assigns + a within-cell join restricted to the cells that
  * received appends — candidate volume is |batch| × (cell size), linear
  * for the constant cell sizes adaptiveK maintains; nothing re-touches
  * the batch-1 clustering. (In production the centroids and batch-1
  * memberships load from the store; here both derive in-plan from the
  * batch-1 filter so the DuckDB twin can replay them — the q153
  * convention.)
  *
  * The oracle replays the split exactly: the Lloyd CTE chain trains on
  * the batch-1 filter only, an extra CTE re-ranks batch-2 vectors
  * against the FROZEN final centroids (the q101 `masg` pattern), and the
  * verify join + per-vector argmax reuse the shared cosine spelling — a
  * hash match certifies cell assignment, the cross-batch pair set, and
  * the keep/flag verdicts end to end. */
object IncrementalCells {

  private val Dim = 64
  private val K = 16
  private val Iters = 2
  private val T = 0.4
  /** Batch split modulus: batch 1 = vec_id % 5 != 0 (80%, the clustered
    * store), batch 2 = vec_id % 5 == 0 (20%, the append) — q153's. */
  private val Mod = 5

  // --------------------------------------------------------------- q339
  def q339CellAppend(spark: SparkSession, dir: String): DataFrame = {
    val all = Kpis.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        norm2(col("embedding")).as("n2"))
    // persist: b1 feeds the Lloyd training, the membership assign, and
    // the verify-side embedding fetch (the q26 multi-consumer convention)
    val b1 = all.filter(col("vec_id") % Mod =!= 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val b2 = all.filter(col("vec_id") % Mod === 0)

    // FROZEN: cell centroids from batch 1 only
    val cent = KMeans.lloydCentroids(b1, K, Iters)
    // stored batch-1 membership + the batch-2 assignment DELTA — both a
    // broadcast k-row nearest-centroid pass; the delta is the append
    val m1 = KMeans.assign(b1, cent)
      .select(col("vec_id").as("a_id"), col("cluster"))
    val m2 = KMeans.assign(b2, cent)
      .select(col("vec_id").as("b_id"), col("cluster"))

    // verify batch-2 ONLY against batch-1 members of its frozen cell
    val pairs = m2.join(m1, "cluster")
      .join(b1.select(col("vec_id").as("a_id"), col("embedding").as("ae"),
        col("n2").as("an2")), "a_id")
      .join(b2.select(col("vec_id").as("b_id"), col("embedding").as("be"),
        col("n2").as("bn2")), "b_id")
      .withColumn("cos_sim",
        dotD(col("ae"), col("be")) / (sqrt(col("an2")) * sqrt(col("bn2"))))
      .filter(col("cos_sim") >= T)

    // per appended vector: match count + deterministic argmax (max cos,
    // ties to the SMALLEST batch-1 id) via the lexicographic max-struct —
    // no window, so partial aggregation stays map-side
    val best = pairs.groupBy(col("b_id"))
      .agg(count(lit(1)).as("n_b1_dups"),
        max(struct(col("cos_sim"), (-col("a_id")).as("neg_a"))).as("m"))
      .select(col("b_id"), col("n_b1_dups"),
        (-col("m.neg_a")).as("best_b1_match"),
        (round(col("m.cos_sim"), 6) + lit(0.0)).as("best_cos"))

    m2.select(col("b_id"), col("cluster").as("cell"))
      .join(best, Seq("b_id"), "left")
      .select(col("b_id").as("vec_id"), col("cell"),
        coalesce(col("n_b1_dups"), lit(0L)).as("n_b1_dups"),
        coalesce(col("best_b1_match"), lit(-1L)).as("best_b1_match"),
        coalesce(col("best_cos"), lit(0.0)).as("best_cos"),
        (coalesce(col("n_b1_dups"), lit(0L)) > 0).as("is_dup"))
      .orderBy("vec_id")
  }

  val q339Sql: String = {
    val (chain0, b1Asg) = KMeans.lloydSqlCtes(
      s"SELECT vec_id, embedding FROM embeddings WHERE vec_id % $Mod != 0",
      Dim, K, Iters, p = "ic")
    // MATERIALIZED: the frozen-centroid CTE is referenced by both the
    // batch-1 and batch-2 assignments, and ic_e four times — DuckDB's
    // default CTE inlining would re-expand the Lloyd chain per reference
    // (the q99 lesson)
    val chain = chain0.replaceAll(
      "(ic_[a-z0-9]+p?) AS \\(", "$1 AS MATERIALIZED (")
    val adot = dotSqlUnrolled("e.embedding", "c.centroid", Dim)
    val pdot = dotSqlUnrolled("a.embedding", "b.embedding", Dim)
    s"""WITH RECURSIVE $chain,
      |b2e AS MATERIALIZED (
      |  SELECT vec_id, embedding,
      |    ${dotSqlUnrolled("embedding", "embedding", Dim)} AS n2
      |  FROM embeddings WHERE vec_id % $Mod = 0),
      |b2asg AS MATERIALIZED (
      |  SELECT vec_id, cluster FROM (
      |    SELECT e.vec_id, c.cluster,
      |      row_number() OVER (
      |        PARTITION BY e.vec_id
      |        ORDER BY (e.n2 + c.cn2) - 2 * ($adot), c.cluster) AS rn
      |    FROM b2e e, ic_c$Iters c) WHERE rn = 1),
      |p AS MATERIALIZED (
      |  SELECT y.vec_id AS b_id, x.vec_id AS a_id,
      |    ($pdot) / (sqrt(a.n2) * sqrt(b.n2)) AS cos_sim
      |  FROM b2asg y
      |  JOIN $b1Asg x ON x.cluster = y.cluster
      |  JOIN ic_e a ON a.vec_id = x.vec_id
      |  JOIN b2e b ON b.vec_id = y.vec_id
      |  WHERE ($pdot) / (sqrt(a.n2) * sqrt(b.n2)) >= $T),
      |cnt AS (SELECT b_id, COUNT(*) AS n_b1_dups FROM p GROUP BY 1),
      |top AS (
      |  SELECT b_id, a_id, cos_sim FROM (
      |    SELECT b_id, a_id, cos_sim,
      |      row_number() OVER (
      |        PARTITION BY b_id ORDER BY cos_sim DESC, a_id) AS rn
      |    FROM p) WHERE rn = 1)
      |SELECT y.vec_id, y.cluster AS cell,
      |  CAST(COALESCE(cnt.n_b1_dups, 0) AS BIGINT) AS n_b1_dups,
      |  CAST(COALESCE(top.a_id, -1) AS BIGINT) AS best_b1_match,
      |  COALESCE(round(top.cos_sim, 6) + 0.0, 0.0) AS best_cos,
      |  COALESCE(cnt.n_b1_dups, 0) > 0 AS is_dup
      |FROM b2asg y
      |LEFT JOIN cnt ON y.vec_id = cnt.b_id
      |LEFT JOIN top ON y.vec_id = top.b_id
      |ORDER BY y.vec_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q339_cell_append" -> (q339CellAppend _))

  def oracles: Map[String, String] = Map(
    "q339_cell_append" -> q339Sql)
}
