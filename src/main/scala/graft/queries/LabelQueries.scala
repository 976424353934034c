package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Crowd-label aggregation — the labeled-dataset construction step of a
  * training pipeline: several unreliable annotators vote on every
  * document's label, and the pipeline must aggregate votes into one label
  * per document. Annotations are synthesized DETERMINISTICALLY from the
  * fixture (5 annotators with planted error rates 0.1 … 0.5, md5-derived
  * error positions and wrong-label picks — both engines re-derive every
  * vote), so the aggregation quality is measurable against the known true
  * label (the document's `lang`).
  */
object LabelQueries {

  /** Annotator m ∈ 0..4 errs on a doc when md5(ann m:doc) % 20 < 2(m+1) —
    * planted error rates 10% … 50%. */
  private val NAnn = 5

  // ---------------------------------------------------------------- q449
  /** Per-document label-aggregation decision table: plain majority vote
    * vs reliability-weighted vote (one fixed Dawid-Skene-style reweight:
    * an annotator's weight is its integer agreement count with the
    * majority — same ranking as agreement RATE since every annotator
    * votes on every doc, but exactly integer). Each row carries the true
    * label, both aggregate labels, the majority's vote count, and the
    * two correctness flags — the shipped artifact plus its own quality
    * audit; the spec asserts the planted property that reweighting
    * strictly helps (low-error annotators dominate the weighted vote).
    *
    * Vote synthesis (identical on both engines): annotator m's vote on
    * doc d is the true lang unless md5("ann m:" ∥ d) % 20 < 2(m+1); a
    * wrong vote picks the (md5("pick m:" ∥ d) % (|langs|−1))-th of the
    * OTHER langs in lexicographic order.
    *
    * Exactness: votes, counts, and weights are integers; labels are
    * strings; both argmaxes tie-break on the lexicographically smallest
    * label; no floating point anywhere.
    *
    * Scale shape: votes are a constant 5-way explode of the doc scan; the
    * wrong-label lookup is a |langs|²-row broadcast; both argmax windows
    * partition per DOCUMENT (5 and ≤5 rows); the annotator weights are a
    * 5-row census broadcast back onto the votes; every agg is
    * map-side-combinable. Two passes over the votes by design (weights
    * need the majority) — the classic two-pass EM step. */
  def q449LabelAggregation(spark: SparkSession, dir: String): DataFrame = {
    val docs = Kpis.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
    val langs = docs.select(col("lang")).distinct()
    val nOther = langs.agg(count(lit(1)).as("nl"))
      .select((col("nl") - 1).as("n_other"))
    // lookup: k-th (0-based, lexicographic) other lang for each true lang
    val wrongs = langs.select(col("lang").as("tl"))
      .join(langs.select(col("lang").as("ol")), col("ol") =!= col("tl"))
      .withColumn("k", row_number().over(
        Window.partitionBy(col("tl")).orderBy(col("ol"))) - 1)
    val votes = docs
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0), lit(NAnn - 1))).as("m"))
      .withColumn("h_err", md5Hash60(
        concat(lit("ann "), col("m"), lit(":"), col("doc_id"))))
      .withColumn("h_pick", md5Hash60(
        concat(lit("pick "), col("m"), lit(":"), col("doc_id"))))
      .withColumn("errs", col("h_err") % 20 < (col("m") + 1) * 2)
      .crossJoin(broadcast(nOther))
      .withColumn("kp", col("h_pick") % col("n_other"))
      .join(broadcast(wrongs),
        col("tl") === col("lang") && col("k") === col("kp"))
      .select(col("doc_id"), col("lang"), col("m"),
        when(col("errs"), col("ol")).otherwise(col("lang")).as("vote"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wMaj = Window.partitionBy(col("doc_id"))
      .orderBy(col("n").desc, col("vote"))
    val majority = votes.groupBy(col("doc_id"), col("vote"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wMaj)).filter(col("rn") === 1)
      .select(col("doc_id"), col("vote").as("majority_label"),
        col("n").as("majority_votes"))
    val weights = votes.join(majority, "doc_id")
      .groupBy(col("m"))
      .agg(sum(when(col("vote") === col("majority_label"), 1L)
        .otherwise(0L)).as("wt"))
    val wW = Window.partitionBy(col("doc_id"))
      .orderBy(col("ws").desc, col("vote"))
    val weighted = votes.join(broadcast(weights), "m")
      .groupBy(col("doc_id"), col("vote"))
      .agg(sum(col("wt")).as("ws"))
      .withColumn("rn", row_number().over(wW)).filter(col("rn") === 1)
      .select(col("doc_id"), col("vote").as("weighted_label"))
    val out = graft.plans.Eager.ckpt(docs
      .join(majority, "doc_id").join(weighted, "doc_id")
      .select(col("doc_id"), col("lang").as("true_lang"),
        col("majority_label"), col("majority_votes"),
        (col("majority_label") === col("lang")).as("majority_correct"),
        col("weighted_label"),
        (col("weighted_label") === col("lang")).as("weighted_correct"))
      .orderBy("doc_id"))
    votes.unpersist()
    out
  }

  val q449Sql: String =
    s"""WITH docs AS (SELECT doc_id, lang FROM documents),
      |langs AS (SELECT DISTINCT lang FROM docs),
      |no AS (SELECT COUNT(*) - 1 AS n_other FROM langs),
      |wrongs AS (
      |  SELECT t.lang AS tl, o.lang AS ol,
      |    row_number() OVER (PARTITION BY t.lang ORDER BY o.lang) - 1 AS k
      |  FROM langs t JOIN langs o ON o.lang != t.lang),
      |votes AS (
      |  SELECT d.doc_id, d.lang, m.m,
      |    CASE WHEN ${md5Hash60Sql("'ann ' || m.m || ':' || d.doc_id")}
      |        % 20 < (m.m + 1) * 2
      |      THEN w.ol ELSE d.lang END AS vote
      |  FROM docs d
      |  CROSS JOIN (SELECT unnest(range(0, $NAnn)) AS m) m
      |  CROSS JOIN no
      |  JOIN wrongs w ON w.tl = d.lang AND w.k =
      |    ${md5Hash60Sql("'pick ' || m.m || ':' || d.doc_id")} % no.n_other),
      |mc AS (
      |  SELECT doc_id, vote, COUNT(*) AS n FROM votes GROUP BY 1, 2),
      |majority AS (
      |  SELECT doc_id, vote AS majority_label, n AS majority_votes
      |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY n DESC, vote) AS rn FROM mc) WHERE rn = 1),
      |weights AS (
      |  SELECT v.m,
      |    SUM(CASE WHEN v.vote = j.majority_label THEN 1 ELSE 0 END) AS wt
      |  FROM votes v JOIN majority j USING (doc_id) GROUP BY 1),
      |wc AS (
      |  SELECT v.doc_id, v.vote, SUM(w.wt) AS ws
      |  FROM votes v JOIN weights w USING (m) GROUP BY 1, 2),
      |weighted AS (
      |  SELECT doc_id, vote AS weighted_label
      |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY ws DESC, vote) AS rn FROM wc) WHERE rn = 1)
      |SELECT d.doc_id, d.lang AS true_lang, j.majority_label,
      |  CAST(j.majority_votes AS BIGINT) AS majority_votes,
      |  j.majority_label = d.lang AS majority_correct,
      |  t.weighted_label, t.weighted_label = d.lang AS weighted_correct
      |FROM docs d JOIN majority j USING (doc_id)
      |JOIN weighted t USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // -------------------------------------------------------------- maps
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q449_label_aggregation" -> (q449LabelAggregation _))

  def oracles: Map[String, String] = Map(
    "q449_label_aggregation" -> q449Sql)
}
