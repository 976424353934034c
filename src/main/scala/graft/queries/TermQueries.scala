package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-level TF-IDF term ranking over the `documents` table — the
  * "what characterizes each language's corpus slice" primitive a
  * training-data pipeline uses for corpus diagnostics and keyword-based
  * filtering. Extension scope (no reference twin): the reference's text
  * handling stops at pandas string cleaning (`dags/src/processor.py:59-61`);
  * this sits beside the other text-analysis operators (DocQueries q20/q23/
  * q24/q31).
  *
  * Shape at scale: one explode→groupBy pass builds the per-(doc, term)
  * occurrence table, which is persisted because BOTH the document-frequency
  * and the term-frequency aggregates consume it (the q42 lesson — without
  * the persist the token explosion re-runs per branch). df(term) is at most
  * vocabulary-sized, so its join back onto (lang, term) counts broadcasts;
  * N arrives as a broadcast 1-row cross join, never a driver collect. The
  * only full-data shuffles are the two hash aggregates, both map-side
  * partial.
  *
  * Cross-engine parity: scores are ROUND(tf * ln(N/df), 6) on BOTH engines —
  * `ln` is libm-dependent (JVM StrictMath-vs-glibc can differ in the last
  * ulp), so the rounded value is what's ranked and emitted; ranking ties
  * break on the term itself.
  */
object TermQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_tfidf_terms" -> ((spark: SparkSession, dir: String) => {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("text"))
      val perDoc = docs
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("doc_id", "lang", "term")
        .agg(count(lit(1)).as("occ"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val dfTbl = perDoc.groupBy("term").agg(count(lit(1)).as("df"))
      val tfTbl = perDoc.groupBy("lang", "term").agg(sum("occ").as("tf"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tfTbl
        .join(dfTbl, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("score", round(
          col("tf").cast("double") *
            log(col("n_docs").cast("double") / col("df").cast("double")), 6))
      val w = Window.partitionBy("lang")
        .orderBy(col("score").desc, col("term"))
      // Eager top-k materialization (3 rows per lang) lets perDoc be
      // unpersisted here — CacheManager pins persist() entries strongly,
      // so returning a lazy plan over perDoc would retain the exploded
      // token table for the JVM's lifetime.
      val out = scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("lang"), col("term"), col("tf"), col("df"),
          col("score"), col("rank"))
        .orderBy("lang", "rank")
        .localCheckpoint(true)
      perDoc.unpersist()
      out
    }))

  def oracles: Map[String, String] = Map(
    "q44_tfidf_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
        |  FROM documents
        |), perdoc AS (
        |  SELECT doc_id, lang, term, COUNT(*) AS occ
        |  FROM tok WHERE length(term) > 0 GROUP BY 1, 2, 3
        |), dft AS (
        |  SELECT term, COUNT(*) AS df FROM perdoc GROUP BY 1
        |), tft AS (
        |  SELECT lang, term, CAST(SUM(occ) AS BIGINT) AS tf
        |  FROM perdoc GROUP BY 1, 2
        |), n AS (
        |  SELECT COUNT(*) AS n_docs FROM documents
        |), scored AS (
        |  SELECT lang, term, tf, df,
        |    ROUND(CAST(tf AS DOUBLE) *
        |      LN(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS score
        |  FROM tft JOIN dft USING (term) CROSS JOIN n
        |), ranked AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY lang ORDER BY score DESC, term) AS INTEGER) AS rank
        |  FROM scored
        |)
        |SELECT lang, term, tf, df, score, rank
        |FROM ranked WHERE rank <= 3 ORDER BY lang, rank""".stripMargin)
}
