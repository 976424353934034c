package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.queries.Kpis

/** Lloyd's k-means over the embeddings table — the clustering step a
  * training-data pipeline runs for domain discovery, diversity sampling,
  * and (at scale) training the coarse quantizer that q33's IVF index
  * assumes as given ("a k-means quantizer would slot in identically",
  * EmbedQueries q33). Deterministic throughout: init is the first k
  * vectors by vec_id, assignment ties break on cluster id, and centroid
  * components round to 6 dp (the q33 centroid convention), so a fixed
  * iteration count replays bit-exactly in DuckDB as unrolled CTEs.
  *
  * Scale shape per iteration: the centroid table is k×dim (always
  * broadcast); assignment is a broadcast product + map-side-combined
  * min(struct) agg — one shuffle of one row per vector; the update is a
  * posexplode + two-level hash agg — one shuffle of k×dim rows. No
  * windows over the corpus, no driver collects; rounds are a fixed
  * constant, not data-dependent (production k-means iterates to a
  * tolerance — same plan per round, a convergence check on the tiny
  * centroid table as the loop guard).
  */
object KMeans {

  private val Dim = 64

  /** (vec_id, embedding, n2) with n2 the exact left-fold self-dot. */
  private def emb(spark: SparkSession, dir: String): DataFrame =
    Kpis.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        norm2(col("embedding")).as("n2"))

  /** Squared L2 distance, spelled (n2 + cn2) - 2*dot in BOTH engines so
    * the doubles are bit-identical and argmin ordering agrees. */
  private def dist2(cn2: Column, dot: Column, n2: Column): Column =
    (n2 + cn2) - lit(2.0) * dot

  /** Nearest-centroid assignment: broadcast the k-row centroid table,
    * fold the k candidates per vector with a map-side-combined
    * min(struct(dist2, cluster)) — the (dist2, cluster) lexicographic min
    * IS the deterministic argmin. */
  private def assign(e: DataFrame, cent: DataFrame): DataFrame =
    e.crossJoin(broadcast(cent))
      .withColumn("d2",
        dist2(col("cn2"), dotD(col("embedding"), col("centroid")),
          col("n2")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cluster"))).as("m"))
      .select(col("vec_id"), col("m.cluster").as("cluster"),
        col("m.d2").as("d2"))

  /** Per-cluster element-wise mean centroid, each component rounded to
    * 6 dp (q33's cross-engine grid), reassembled in dimension order.
    * Clusters that lose every member drop out — k shrinks, consistently
    * in both engines. */
  private def update(e: DataFrame, asg: DataFrame): DataFrame =
    asg.join(e, "vec_id")
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(round(avg(col("v").cast("double")), 6).as("cv"))
      .groupBy(col("cluster"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("centroid"))
      .withColumn("cn2", norm2(col("centroid")))

  /** `iters` update rounds from the deterministic init, then a final
    * assignment against the last centroids. */
  def lloyd(e: DataFrame, k: Int, iters: Int): DataFrame = {
    val init = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cluster"),
        transform(col("embedding"), v => v.cast("double")).as("centroid"))
      .withColumn("cn2", norm2(col("centroid")))
    val last = (1 to iters).foldLeft(init)((c, _) => update(e, assign(e, c)))
    assign(e, last)
  }

  // ---------------------------------------------------------------- q60
  /** k=8, two update rounds, per-vector assignment with the final squared
    * distance rounded to 6 dp for the cross-engine hash. */
  def q60Kmeans(spark: SparkSession, dir: String): DataFrame =
    lloyd(emb(spark, dir), k = 8, iters = 2)
      .select(col("vec_id"), col("cluster"),
        round(col("d2"), 6).as("d2"))
      .orderBy("vec_id")

  val q60Sql: String = {
    val centroidList = (1 to Dim)
      .map(i => s"round(avg(CAST(embedding[$i] AS DOUBLE)), 6)")
      .mkString("[", ", ", "]")
    val initList = (1 to Dim)
      .map(i => s"CAST(embedding[$i] AS DOUBLE)")
      .mkString("[", ", ", "]")
    def assignCte(name: String, centCte: String) =
      s"""$name AS (
        |  SELECT vec_id, cluster, d2 FROM (
        |    SELECT e.vec_id, c.cluster,
        |      (e.n2 + c.cn2) - 2 * (${dotSqlUnrolled("e.embedding", "c.centroid", Dim)}) AS d2,
        |      row_number() OVER (
        |        PARTITION BY e.vec_id
        |        ORDER BY (e.n2 + c.cn2) - 2 * (${dotSqlUnrolled("e.embedding", "c.centroid", Dim)}), c.cluster
        |      ) AS rn
        |    FROM e, $centCte c) WHERE rn = 1)""".stripMargin
    def updateCte(name: String, asgCte: String) =
      s"""${name}0 AS (
        |  SELECT cluster, $centroidList AS centroid
        |  FROM $asgCte JOIN e USING (vec_id) GROUP BY cluster),
        |$name AS (
        |  SELECT cluster, centroid,
        |    ${dotSqlUnrolled("centroid", "centroid", Dim)} AS cn2
        |  FROM ${name}0)""".stripMargin
    s"""WITH e AS (
      |  SELECT vec_id, embedding,
      |    ${dotSqlUnrolled("embedding", "embedding", Dim)} AS n2
      |  FROM embeddings),
      |c0 AS (
      |  SELECT vec_id AS cluster, $initList AS centroid,
      |    ${dotSqlUnrolled("embedding", "embedding", Dim)} AS cn2
      |  FROM embeddings WHERE vec_id < 8),
      |${assignCte("a0", "c0")},
      |${updateCte("c1", "a0")},
      |${assignCte("a1", "c1")},
      |${updateCte("c2", "a1")},
      |${assignCte("a2", "c2")}
      |SELECT vec_id, cluster, round(d2, 6) AS d2
      |FROM a2 ORDER BY vec_id""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_kmeans" -> (q60Kmeans _))

  def oracles: Map[String, String] = Map(
    "q60_kmeans" -> q60Sql)
}
