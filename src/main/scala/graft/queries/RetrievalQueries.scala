package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** The RETRIEVAL-INDEX layer over the `documents` table — what a user does
  * with a curated corpus next: cut it into overlapping passages, featurize
  * them, and serve similarity queries against the passage index (the RAG
  * shape; reference scope: the same documents/embeddings tables its
  * dedup/ANN queries run on, lifted from document to passage granularity).
  *
  * Chunking: fixed-size sliding window — C = 24 tokens, stride S = 16
  * (8-token overlap), a trailing window is emitted only when it retains
  * MinTail = 8 tokens (or is the document's only window). Featurization:
  * the feature-hashing trick (Weinberger et al. 2009, public): token →
  * dimension via md5-60-bit hash mod D = 32, sign from hash bit 5, chunk
  * vector = signed token-count histogram. INTEGER vectors throughout —
  * dots and norms are exact int64 arithmetic on both engines (no FP-order
  * convention needed; only the final cosine performs FP ops, spelled
  * identically on both sides).
  *
  * Scale posture: chunking + featurization are pure per-row array
  * expressions (codegen'd HOFs, zero shuffle — the index build is
  * embarrassingly parallel and the chunk table writes out partitioned by
  * whatever the sink buckets on). Retrieval queries broadcast the BOUNDED
  * query side and stream the index (q21's discipline); the production
  * path for unbounded query sets is the banded signature index whose
  * health q445 measures.
  */
object RetrievalQueries {

  /** Chunk size (tokens). */
  private[graft] val C = 24
  /** Stride between window starts; C − S = 8 tokens of overlap. */
  private val S = 16
  /** A trailing window must keep at least this many tokens. */
  private val MinTail = 8
  /** Feature-hash dimensions. */
  private[graft] val D = 32

  private def tokDocs(spark: SparkSession, dir: String): DataFrame =
    Kpis.table(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), tokens(lower(col("text"))).as("toks"))

  /** Sliding-window chunk rows (doc_id, chunk_id, t0, ctoks) from a
    * (doc_id, toks) frame. Start positions 0, S, 2S, … < n; a non-initial
    * window is kept only when ≥ MinTail tokens remain. Pure array ops —
    * no shuffle. */
  private def chunked(toksDf: DataFrame): DataFrame = {
    val starts = filter(
      sequence(lit(0), size(col("toks")) - 1, lit(S)),
      s => (s === 0) || (size(col("toks")) - s >= MinTail))
    toksDf
      .select(col("doc_id"), col("toks"),
        posexplode(starts).as(Seq("chunk_id", "t0")))
      .select(col("doc_id"), col("chunk_id"), col("t0"),
        slice(col("toks"), col("t0") + 1, lit(C)).as("ctoks"))
  }

  /** SQL twin of [[chunked]] from a tokens CTE `$toksCte` (doc_id, toks):
    * CTEs ending in `ck$sfx` (doc_id, chunk_id, t0, ctoks; t0/chunk_id
    * INTEGER). */
  private def chunkSql(toksCte: String, sfx: String): String =
    s"""st$sfx AS (
      |  SELECT doc_id, toks, unnest(range(0, len(toks), $S)) AS s0
      |  FROM $toksCte),
      |fs$sfx AS (
      |  SELECT doc_id, toks, s0,
      |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s0) - 1
      |      AS INTEGER) AS chunk_id
      |  FROM st$sfx WHERE s0 = 0 OR len(toks) - s0 >= $MinTail),
      |ck$sfx AS (
      |  SELECT doc_id, chunk_id, CAST(s0 AS INTEGER) AS t0,
      |    toks[s0 + 1 : s0 + $C] AS ctoks
      |  FROM fs$sfx)""".stripMargin

  private def tokSql: String =
    """SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      |FROM documents WHERE length(trim(text)) > 0""".stripMargin

  /** Feature-hash encoding of one token: dimension = md5-60-bit hash mod D,
    * sign from hash bit 5 (+1 when clear). */
  private def dimOf(h: Column): Column = (h % D).cast("int")
  private def signOf(h: Column): Column =
    when(shiftright(h, 5).bitwiseAND(lit(1L)) === lit(0L), lit(1L))
      .otherwise(lit(-1L))

  /** Chunk vector: D-length signed token-count histogram (array<bigint>),
    * built by a per-row fold — zero shuffle. */
  private def chunkVec(ctoks: Column): Column = {
    val enc = transform(ctoks, t =>
      struct(dimOf(md5Hash60(t)).as("d"), signOf(md5Hash60(t)).as("s")))
    aggregate(enc, array_repeat(lit(0L), D),
      (acc, e) => transform(acc, (v, i) =>
        v + when(e.getField("d") === i, e.getField("s")).otherwise(lit(0L))))
  }

  /** Dimension with the largest |weight| (smallest dim on ties); −1 when
    * the vector is all-zero (total sign cancellation). */
  private def topDim(vec: Column): Column = {
    val zipped = zip_with(vec, sequence(lit(0), lit(D - 1)),
      (w, i) => struct(abs(w).as("a"), i.as("d")))
    val nz = filter(zipped, e => e.getField("a") > 0)
    aggregate(nz, struct(lit(-1L).as("a"), lit(-1).as("d")),
      (b, e) => when(e.getField("a") > b.getField("a"), e).otherwise(b))
      .getField("d")
  }

  /** Exact integer squared L2 norm of the chunk vector. */
  private def vecN2(vec: Column): Column =
    aggregate(vec, lit(0L), (a, x) => a + x * x)

  /** SQL twin of the per-chunk dim-weight table from `ck$sfx`: CTE
    * `wt$sfx` (doc_id, chunk_id, dim INTEGER, w BIGINT) — one row per
    * dimension HIT by ≥1 token (weights may cancel to 0; dimensions never
    * hit have no row, which every consumer treats as w = 0). */
  private def wtSql(sfx: String): String =
    s"""tkn$sfx AS (
      |  SELECT doc_id, chunk_id, unnest(ctoks) AS t FROM ck$sfx),
      |hsh$sfx AS (
      |  SELECT doc_id, chunk_id, ${md5Hash60Sql("t")} AS h FROM tkn$sfx),
      |wt$sfx AS (
      |  SELECT doc_id, chunk_id, CAST(h % $D AS INTEGER) AS dim,
      |    CAST(SUM(CASE WHEN ((h >> 5) & 1) = 0 THEN 1 ELSE -1 END)
      |      AS BIGINT) AS w
      |  FROM hsh$sfx GROUP BY 1, 2, 3)""".stripMargin

  // ---------------------------------------------------------------- q441
  /** The passage-index manifest: one row per chunk with its start, length,
    * exact-text fingerprint, and feature-vector stats (squared norm,
    * non-zero dims, dominant dim).
    *
    * Exactness: everything is integer or md5 hex — the vector is a signed
    * integer histogram, n2 = Σw², nnz counts w ≠ 0, top_dim is the max-|w|
    * dim with smallest-dim tie-break (−1 on an all-cancelled vector); no
    * floating point anywhere.
    *
    * Scale shape: zero shuffle until the output sort — tokenize, window,
    * slice, hash, and fold are all per-row codegen'd array expressions;
    * the plan is Scan → Project → Sort. At 100 TB the index build is
    * scan-bound and the sort is the sink's own ordering choice. */
  def q441ChunkIndex(spark: SparkSession, dir: String): DataFrame =
    chunked(tokDocs(spark, dir))
      .withColumn("vec", chunkVec(col("ctoks")))
      .select(col("doc_id"), col("chunk_id"), col("t0"),
        size(col("ctoks")).as("n_toks"),
        md5(concat_ws(" ", col("ctoks"))).as("chunk_fp"),
        vecN2(col("vec")).as("n2"),
        size(filter(col("vec"), x => x =!= lit(0L))).as("nnz"),
        topDim(col("vec")).as("top_dim"))
      .orderBy("doc_id", "chunk_id")

  val q441Sql: String =
    s"""WITH d AS ($tokSql),
      |${chunkSql("d", "")},
      |${wtSql("")},
      |st2 AS (
      |  SELECT doc_id, chunk_id, CAST(SUM(w * w) AS BIGINT) AS n2,
      |    CAST(COUNT(*) FILTER (WHERE w != 0) AS INTEGER) AS nnz
      |  FROM wt GROUP BY 1, 2),
      |tp AS (
      |  SELECT doc_id, chunk_id, dim,
      |    row_number() OVER (PARTITION BY doc_id, chunk_id
      |      ORDER BY abs(w) DESC, dim) AS rn
      |  FROM wt WHERE w != 0)
      |SELECT ck.doc_id, ck.chunk_id, ck.t0,
      |  CAST(len(ck.ctoks) AS INTEGER) AS n_toks,
      |  md5(array_to_string(ck.ctoks, ' ')) AS chunk_fp,
      |  s.n2, s.nnz, COALESCE(t.dim, -1) AS top_dim
      |FROM ck JOIN st2 s USING (doc_id, chunk_id)
      |LEFT JOIN tp t ON t.doc_id = ck.doc_id AND t.chunk_id = ck.chunk_id
      |  AND t.rn = 1
      |ORDER BY ck.doc_id, ck.chunk_id""".stripMargin

  // ---------------------------------------------------------------- q442
  /** Passage retrieval eval: a deterministic query cohort (docs ≡ 3
    * mod 41 with ≥ 28 tokens) quotes tokens [4, 20) of itself as the
    * query text; each query retrieves its cosine top-3 chunks from the
    * q441 index. `self_hit` marks results drawn from the quoted document —
    * the retrieval sanity a RAG index must pass.
    *
    * Exactness: the dot product and both norms are exact int64 (the
    * hashing-trick vectors are integer histograms), so the ONLY FP op is
    * the final cosine — one cast, one multiply, one sqrt, one divide,
    * spelled identically on both engines → bit-identical doubles. Rank
    * ties break on (doc_id, chunk_id).
    *
    * Scale shape: the query cohort is modulus-bounded (q26's CertSlice
    * discipline) and BROADCAST; the index streams through one
    * BroadcastNestedLoopJoin — no shuffle of the index at all; the only
    * exchange is the per-query top-3 window over Q·N skinny score rows.
    * An unbounded production query stream flips to the banded-signature
    * equi-join whose bucket health q445 certifies. */
  def q442PassageRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val td = tokDocs(spark, dir)
    val qs = td.filter(col("doc_id") % 41 === 3 && size(col("toks")) >= 28)
      .select(col("doc_id").as("query_id"),
        slice(col("toks"), 4, 16).as("qtoks"))
      .withColumn("qvec", chunkVec(col("qtoks")))
      .select(col("query_id"), col("qvec"), vecN2(col("qvec")).as("qn2"))
      .filter(col("qn2") > 0)
    val ch = chunked(td)
      .withColumn("vec", chunkVec(col("ctoks")))
      .select(col("doc_id"), col("chunk_id"), col("vec"),
        vecN2(col("vec")).as("n2"))
      .filter(col("n2") > 0)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("doc_id"), col("chunk_id"))
    ch.crossJoin(broadcast(qs))
      .withColumn("dot", aggregate(
        zip_with(col("vec"), col("qvec"), (x, y) => x * y),
        lit(0L), (a, x) => a + x))
      .withColumn("cos", col("dot").cast("double") /
        sqrt((col("qn2") * col("n2")).cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("doc_id"), col("chunk_id"),
        col("dot"), col("cos"),
        (col("doc_id") === col("query_id")).as("self_hit"))
      .orderBy("query_id", "rank")
  }

  val q442Sql: String =
    s"""WITH d AS ($tokSql),
      |${chunkSql("d", "")},
      |${wtSql("")},
      |cst AS (
      |  SELECT doc_id, chunk_id, CAST(SUM(w * w) AS BIGINT) AS n2
      |  FROM wt GROUP BY 1, 2 HAVING SUM(w * w) > 0),
      |qd AS (
      |  SELECT doc_id AS query_id, toks[4 : 19] AS qtoks
      |  FROM d WHERE doc_id % 41 = 3 AND len(toks) >= 28),
      |qtk AS (SELECT query_id, unnest(qtoks) AS t FROM qd),
      |qh AS (SELECT query_id, ${md5Hash60Sql("t")} AS h FROM qtk),
      |qwt AS (
      |  SELECT query_id, CAST(h % $D AS INTEGER) AS dim,
      |    CAST(SUM(CASE WHEN ((h >> 5) & 1) = 0 THEN 1 ELSE -1 END)
      |      AS BIGINT) AS w
      |  FROM qh GROUP BY 1, 2),
      |qst AS (
      |  SELECT query_id, CAST(SUM(w * w) AS BIGINT) AS qn2
      |  FROM qwt GROUP BY 1 HAVING SUM(w * w) > 0),
      |dots AS (
      |  SELECT q.query_id, c.doc_id, c.chunk_id,
      |    CAST(SUM(q.w * c.w) AS BIGINT) AS dot
      |  FROM qwt q JOIN wt c USING (dim) GROUP BY 1, 2, 3),
      |pairs AS (
      |  SELECT q.query_id, c.doc_id, c.chunk_id, q.qn2, c.n2,
      |    COALESCE(dt.dot, 0) AS dot
      |  FROM qst q CROSS JOIN cst c
      |  LEFT JOIN dots dt ON dt.query_id = q.query_id
      |    AND dt.doc_id = c.doc_id AND dt.chunk_id = c.chunk_id),
      |scored AS (
      |  SELECT query_id, doc_id, chunk_id, dot,
      |    CAST(dot AS DOUBLE) / sqrt(CAST(qn2 * n2 AS DOUBLE)) AS cos
      |  FROM pairs),
      |rk AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, doc_id, chunk_id) AS INTEGER) AS rank
      |  FROM scored)
      |SELECT query_id, rank, doc_id, chunk_id, dot, cos,
      |  doc_id = query_id AS self_hit
      |FROM rk WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  // -------------------------------------------------------------- maps
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q441_chunk_index" -> (q441ChunkIndex _),
    "q442_passage_retrieval" -> (q442PassageRetrieval _))

  def oracles: Map[String, String] = Map(
    "q441_chunk_index" -> q441Sql,
    "q442_passage_retrieval" -> q442Sql)
}
