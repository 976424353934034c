package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity-search operators over the `embeddings` table (builder brief:
  * ANN over an `array<float>` column — brute-force cosine top-k baseline +
  * an LSH-bucketed scale path).
  *
  * Oracle parity: the dot product is a sequential left fold of exact
  * float→double products, and the DuckDB oracle spells the SAME
  * left-associated 64-term sum ([[VectorFunctions.dotSqlUnrolled]]), so
  * cosine values are bit-identical doubles on both sides — no rounding
  * fudge needed.
  *
  * Scale posture: brute-force top-k is O(|Q|·N) with the tiny query set
  * broadcast (BroadcastNestedLoopJoin) — the right plan when Q is small.
  * All-pairs near-dup at 100 TB must NOT be a cross join; q28 shows the
  * sign-LSH banding path where candidates come from an equi-join on
  * signature bands.
  */
object EmbedQueries {

  private val Dim = 64

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Kpis.table(spark, dir, "embeddings")

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      norm2(col("embedding")).as("n2"))

  private def normSqlCte: String =
    s"SELECT vec_id, embedding, ${dotSqlUnrolled("embedding", "embedding", Dim)} AS n2 FROM embeddings"

  // ---------------------------------------------------------------- q21
  /** Brute-force cosine top-10 for the first 5 query vectors. The 5-row
    * query side broadcasts; rank ties break on neighbor_id for
    * determinism. */
  def q21CosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(emb(spark, dir))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("qe"), col("n2").as("qn2"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"), col("n2").as("cn2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    // Broadcast the provably-tiny QUERY side and stream the corpus —
    // corpus-side broadcast (the default BuildRight here) would ship the
    // whole collection to every task at scale.
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        dotD(col("qe"), col("ce")) / (sqrt(col("qn2")) * sqrt(col("cn2"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos_sim"))
      .orderBy("query_id", "rank")
  }

  val q21Sql: String = {
    val dot = dotSqlUnrolled("q.embedding", "c.embedding", Dim)
    s"""WITH e AS ($normSqlCte),
      |p AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    ($dot) / (sqrt(q.n2) * sqrt(c.n2)) AS cos_sim
      |  FROM e q, e c
      |  WHERE q.vec_id < 5 AND c.vec_id != q.vec_id),
      |r AS (
      |  SELECT *, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INTEGER) AS rank
      |  FROM p)
      |SELECT query_id, neighbor_id, rank, cos_sim
      |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q26
  /** Embedding-cosine near-duplicate pairs above a similarity threshold
    * (all-pairs at fixture scale — the LSH path in q28 is the 100 TB
    * variant of this exact query). */
  def q26EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(emb(spark, dir))
    // The fixture table is one parquet file → one input split; without an
    // explicit spread the whole O(N²) pair evaluation runs on ONE core
    // (measured 31 s at sf0.1). Repartitioning the streamed side puts each
    // core on a slice of the pairs; at production scale the scan itself
    // supplies the splits and this is a no-op-sized shuffle of the small
    // side.
    val par = spark.sparkContext.defaultParallelism
    // hash- (not round-robin-) partitioned: assignment is a pure function
    // of the key, deterministic under any task retry order
    val a = e.repartition(par, col("vec_id")).select(col("vec_id").as("a_id"),
      col("embedding").as("ae"), col("n2").as("an2"))
    val b = e.select(col("vec_id").as("b_id"),
      col("embedding").as("be"), col("n2").as("bn2"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos_sim",
        dotD(col("ae"), col("be")) / (sqrt(col("an2")) * sqrt(col("bn2"))))
      .filter(col("cos_sim") >= 0.4)
      .select(col("a_id"), col("b_id"), col("cos_sim"))
      .orderBy("a_id", "b_id")
  }

  val q26Sql: String = {
    val dot = dotSqlUnrolled("a.embedding", "b.embedding", Dim)
    s"""WITH e AS ($normSqlCte),
      |p AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |    ($dot) / (sqrt(a.n2) * sqrt(b.n2)) AS cos_sim
      |  FROM e a, e b WHERE a.vec_id < b.vec_id)
      |SELECT a_id, b_id, cos_sim FROM p
      |WHERE cos_sim >= 0.4 ORDER BY a_id, b_id""".stripMargin
  }

  // ---------------------------------------------------------------- q28
  /** Sign-LSH bucketed ANN (rows-only: plan-time LCG hyperplanes have no
    * DuckDB twin). 16 hyperplane sign bits → 2 bands × 8 bits → candidates
    * = corpus vectors sharing any band with the query → exact cosine rank
    * within candidates, top 5. At scale the band join replaces the
    * all-pairs product with a hash shuffle on (band, band_val). */
  def q28AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val planes = hyperplanes(16, Dim)
    val e = withNorm(emb(spark, dir))
      .withColumn("sig", lshSignature(col("embedding"), planes))
    val banded = e
      .select(col("vec_id"), col("embedding"), col("n2"),
        explode(lshBands("sig", 16, 2)).as("b"))
      .select(col("vec_id"), col("embedding"), col("n2"),
        col("b.band").as("band"), col("b.band_val").as("band_val"))
    val q = banded.filter(col("vec_id") < 5)
      .select(col("band"), col("band_val"), col("vec_id").as("query_id"),
        col("embedding").as("qe"), col("n2").as("qn2"))
    val c = banded.select(col("band"), col("band_val"),
      col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"), col("n2").as("cn2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, Seq("band", "band_val"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotD(col("qe"), col("ce")) / (sqrt(col("qn2")) * sqrt(col("cn2"))))
          .as("cos_sim"))
      .distinct() // a pair can share both bands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------- q33
  /** IVF (inverted-file) ANN. Index build: a coarse quantizer assigns every
    * vector to a cell (here: a 4-bit sign-LSH signature → 16 cells; a
    * k-means quantizer would slot in identically) and each cell gets an
    * element-wise mean centroid. Query: rank the 16 centroids by cosine,
    * probe only the `nprobe` best cells, exact-rank inside them.
    *
    * Scale shape: the centroid table is tiny (cells × dim — broadcast), the
    * query→cell ranking is O(|Q|·cells), and the candidate join is an
    * equi-join on cell id — the corpus scan prunes to nprobe/cells of the
    * data. With nprobe = all cells the result is EXACTLY brute force
    * (asserted in tests); smaller nprobe trades recall for scan fraction.
    */
  def ivfTopK(spark: SparkSession, dir: String,
              nprobe: Int, k: Int): DataFrame = {
    val cellPlanes = hyperplanes(4, Dim, seed = 7L)
    val e = withNorm(emb(spark, dir))
      .withColumn("cell", lshSignature(col("embedding"), cellPlanes))
    // element-wise mean centroid per cell (posexplode → per-dim avg →
    // reassemble in dim order)
    val centroids = e
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("v")).as("cv"))
      .groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("cv")))),
        s => s.getField("cv")).as("centroid"))
      .withColumn("cn2", norm2(col("centroid")))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("qe"), col("n2").as("qn2"))
    // rank cells per query by centroid cosine, keep the nprobe best
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("c_sim").desc, col("cell"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("c_sim",
        dotD(col("qe"), col("centroid")) /
          (sqrt(col("qn2")) * sqrt(col("cn2"))))
      .withColumn("c_rank", row_number().over(wCell))
      .filter(col("c_rank") <= nprobe)
      .select(col("query_id"), col("qe"), col("qn2"), col("cell"))
    // search only the probed cells: equi-join on cell id
    val cand = e.select(col("cell"), col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"), col("n2").as("cn2v"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    probed.join(cand, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotD(col("qe"), col("ce")) / (sqrt(col("qn2")) * sqrt(col("cn2v"))))
          .as("cos_sim"))
      .distinct() // a pair may surface via several probed cells? (cells are disjoint — kept for safety)
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Rows-only registered entry: probe 4 of 16 cells, top-5. */
  def q33AnnIvf(spark: SparkSession, dir: String): DataFrame =
    ivfTopK(spark, dir, nprobe = 4, k = 5)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_cosine_topk" -> q21CosineTopk _,
    "q26_embedding_near_dup" -> q26EmbeddingNearDup _,
    "q28_ann_lsh" -> q28AnnLsh _,
    "q33_ann_ivf" -> q33AnnIvf _)

  /** q28 is rows-only (LCG hyperplanes have no SQL twin). */
  def oracles: Map[String, String] = Map(
    "q21_cosine_topk" -> q21Sql,
    "q26_embedding_near_dup" -> q26Sql)
}
