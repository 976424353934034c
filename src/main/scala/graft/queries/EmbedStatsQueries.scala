package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space distribution statistics — the drift-monitoring
  * primitive of an embedding pipeline: per-dimension means and the full
  * upper-triangle covariance matrix of the corpus embeddings. Comparing
  * these against a reference snapshot (q90's diff, or a simple threshold)
  * is the standard cheap detector for encoder drift, ingest corruption,
  * or a population shift — before any expensive ANN index is rebuilt.
  */
object EmbedStatsQueries {

  // --------------------------------------------------------------- q119
  /** Upper-triangle covariance (dim 64 → 2,080 (i,j) rows): n, the two
    * dimension means, and cov_ij = Σxy/n − x̄·ȳ.
    *
    * Exactness: elements are rounded to the 9-dp grid and cast
    * DECIMAL(18,9) once, so Σx and Σxy are EXACT decimal sums (the q115
    * upgrade of the q69 convention — no float summation-order jitter);
    * the covariance is then single double ops on identical exact
    * operands, rounded to 6 dp with the negative-zero guard
    * (covariances sit on both sides of zero by nature).
    *
    * Scale shape: the mean pass explodes dim entries per row, the
    * covariance pass dim(dim+1)/2 products per row — both collapse via
    * map-side partial aggregation to (dim) and (dim²/2) groups before
    * any shuffle, so shuffle volume is independent of corpus size. The
    * declarative explode trades CPU (a 2,080× row fan-out pre-combine)
    * for zero custom code at dim 64; at 1024+ dims the same sums would
    * move into a typed Aggregator accumulating one triangle array per
    * partition (the ConsistentSample pattern) — identical semantics,
    * same store contract. */
  def q119EmbedCovariance(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val v = spark.read.parquet(s"$dir/embeddings.parquet")
      // single-file fixture scan = ONE partition; spread before the
      // explodes (q48's lesson) — at scale the scan supplies the splits
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .select(transform(col("embedding"),
        x => round(x.cast("double"), 9).cast("decimal(18,9)")).as("vv"))
    val means = v
      .select(explode(transform(sequence(lit(1), lit(dim)),
        i => struct(i.as("i"), element_at(col("vv"), i).as("x")))).as("e"))
      .groupBy(col("e.i").as("i"))
      .agg(count(lit(1)).as("n"), sum(col("e.x")).as("sx"))
    val prods = v
      .select(explode(flatten(transform(sequence(lit(1), lit(dim)), i =>
        transform(sequence(i, lit(dim)), j =>
          struct(i.as("i"), j.as("j"),
            (element_at(col("vv"), i) * element_at(col("vv"), j))
              .as("p")))))).as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum(col("e.p")).as("sxy"))
    val mi = means.select(col("i"), col("n"), col("sx").as("si"))
    val mj = means.select(col("i").as("j"), col("sx").as("sj"))
    val nd = col("n").cast("double")
    prods.join(mi, "i").join(mj, "j")
      .select(col("i").as("dim_i"), col("j").as("dim_j"), col("n"),
        (round(col("si").cast("double") / nd, 6) + lit(0.0)).as("mean_i"),
        (round(col("sj").cast("double") / nd, 6) + lit(0.0)).as("mean_j"),
        (round(col("sxy").cast("double") / nd -
          (col("si").cast("double") / nd) * (col("sj").cast("double") / nd),
          6) + lit(0.0)).as("cov"))
      .orderBy("dim_i", "dim_j")
  }

  val q119Sql: String =
    """WITH v AS MATERIALIZED (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE), 9) AS DECIMAL(18,9))) AS vv
      |  FROM embeddings),
      |dims AS (
      |  SELECT i, COUNT(*) AS n, SUM(vv[i]) AS sx
      |  FROM v CROSS JOIN generate_series(1, 64) AS t(i)
      |  GROUP BY i),
      |prods AS (
      |  SELECT i, j, SUM(vv[i] * vv[j]) AS sxy
      |  FROM v
      |  CROSS JOIN generate_series(1, 64) AS ti(i)
      |  CROSS JOIN generate_series(1, 64) AS tj(j)
      |  WHERE j >= i
      |  GROUP BY i, j)
      |SELECT CAST(p.i AS INTEGER) AS dim_i, CAST(p.j AS INTEGER) AS dim_j,
      |  di.n AS n,
      |  round(CAST(di.sx AS DOUBLE) / CAST(di.n AS DOUBLE), 6) + 0.0
      |    AS mean_i,
      |  round(CAST(dj.sx AS DOUBLE) / CAST(di.n AS DOUBLE), 6) + 0.0
      |    AS mean_j,
      |  round(CAST(p.sxy AS DOUBLE) / CAST(di.n AS DOUBLE)
      |        - (CAST(di.sx AS DOUBLE) / CAST(di.n AS DOUBLE))
      |          * (CAST(dj.sx AS DOUBLE) / CAST(di.n AS DOUBLE)), 6) + 0.0
      |    AS cov
      |FROM prods p
      |JOIN dims di ON di.i = p.i
      |JOIN dims dj ON dj.i = p.j
      |ORDER BY dim_i, dim_j""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q119_embed_covariance" -> (q119EmbedCovariance _))

  def oracles: Map[String, String] = Map(
    "q119_embed_covariance" -> q119Sql)
}
