package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Consistent train/val/test splitting — the assignment primitive of a
  * training-data pipeline. Extension scope (no reference twin; the
  * reference has no notion of splits).
  *
  * The split is a pure function of the document key: hash the key with a
  * salt ("split:" prefix, so re-keying for a different experiment is just
  * a different salt) and bucket on the md5 hex prefix by STRING range —
  * `00..cb` train (204/256 ≈ 79.7%), `cc..e5` val (26/256 ≈ 10.2%),
  * `e6..ff` test. Range-on-hex rather than hex→int mod keeps the rule
  * bit-identical across engines with no integer-parsing dialect
  * differences. Properties that matter at 100 TB: stateless (no lookup
  * table, no shuffle to assign — a narrow projection), stable under
  * corpus growth (a doc's split never changes when others are added),
  * and join-free to reproduce anywhere the key exists.
  *
  * q46 emits the per-(lang, split) census — row counts, average length,
  * and each split's within-language fraction — which is also the
  * stratification check: a consistent hash split is stratified across any
  * attribute independent of the key.
  */
object SplitQueries {

  /** Split-assignment column: deterministic train/val/test from any
    * string key. */
  def splitFor(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val h2 = substring(md5(concat(lit("split:"), key)), 1, 2)
    when(h2 < "cc", "train").when(h2 < "e6", "val").otherwise("test")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_split_census" -> ((spark: SparkSession, dir: String) => {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("text"))
        .withColumn("split", splitFor(col("doc_id").cast("string")))
      val census = docs.groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          (sum(length(col("text"))).cast("double") / count(lit(1)))
            .as("avg_chars"))
      census
        .withColumn("frac", col("n_docs").cast("double") /
          sum("n_docs").over(Window.partitionBy("lang")))
        .orderBy("lang", "split")
    }))

  def oracles: Map[String, String] = Map(
    "q46_split_census" ->
      """WITH d AS (
        |  SELECT lang, length(text) AS chars,
        |    CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
        |           THEN 'train'
        |         WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |census AS (
        |  SELECT lang, split, COUNT(*) AS n_docs,
        |    CAST(SUM(chars) AS DOUBLE) / COUNT(*) AS avg_chars
        |  FROM d GROUP BY 1, 2)
        |SELECT lang, split, n_docs, avg_chars,
        |  CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY lang) AS frac
        |FROM census ORDER BY lang, split""".stripMargin)
}
