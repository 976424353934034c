package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the `documents` table — the lexical-scoring
  * complement of q44's corpus TF-IDF and the standard first-stage
  * retriever a training-data pipeline runs for decontamination probes and
  * topic targeting. Extension scope (no reference twin; the reference's
  * text handling stops at pandas cleaning).
  *
  * Shape at scale: one explode→groupBy pass builds per-(doc, query-term)
  * tf for the O(|q|) query terms only (the IN filter prunes the exploded
  * stream BEFORE the aggregate — the shuffle carries query-term rows, not
  * the corpus vocabulary); df and the corpus length stats are
  * broadcast-sized; the final top-20 lowers to TakeOrderedAndProject.
  *
  * Cross-engine parity: tf/df/dl/N are exact integers; avgdl is one
  * division; each per-(doc,term) score is the same IEEE chain in both
  * engines, rounded to 9 dp (the per-element ln grid), and the per-doc
  * sum of those rounded scores runs as DECIMAL(28,9) so regrouping
  * cannot jitter the total.
  */
object RankQueries {

  /** Fixed query — terms known to exist in the synthetic vocabulary. */
  private val QueryTerms = Seq("spark", "query", "join")
  private val K1 = 1.2

  // ---------------------------------------------------------------- q78
  def q78Bm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    // per-document length (every token, not just query terms)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = toks.filter(col("term").isin(QueryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      ((col("n_docs").cast("double") - col("df")) + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    // BM25 with k1=1.2, b=0.75: 1-b and b pre-folded to literals so both
    // engines run the identical op chain
    val den = col("tf").cast("double") + lit(K1) *
      (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl")))
    // 2.2 as a literal, NOT K1 + 1.0: the Scala double sum 1.2 + 1.0 is
    // one ulp BELOW the parsed literal 2.2 that DuckDB's decimal→double
    // promotion produces
    val num = col("tf").cast("double") * lit(2.2)
    tf.join(broadcast(dfTbl), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", avgdl)
      .withColumn("score",
        round(idf * (num / den), 9).cast("decimal(28,9)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("score")).cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  val q78Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tok1 AS (SELECT * FROM tok WHERE length(term) > 0),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok1 GROUP BY 1),
      |stats AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
      |  FROM dl),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM tok1
      |  WHERE term IN ('spark', 'query', 'join') GROUP BY 1, 2),
      |dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id,
      |    CAST(ROUND(
      |      LN(1.0 + ((CAST(n_docs AS DOUBLE) - df) + 0.5)
      |                / (CAST(df AS DOUBLE) + 0.5))
      |      * ((CAST(tf AS DOUBLE) * 2.2)
      |         / (CAST(tf AS DOUBLE)
      |            + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
      |                / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))),
      |      9) AS DECIMAL(28,9)) AS score
      |  FROM tf JOIN dft USING (term) JOIN dl USING (doc_id)
      |  CROSS JOIN stats)
      |SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(score) AS DOUBLE) AS bm25
      |FROM scored GROUP BY doc_id
      |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q78_bm25" -> (q78Bm25 _))

  def oracles: Map[String, String] = Map(
    "q78_bm25" -> q78Sql)
}
