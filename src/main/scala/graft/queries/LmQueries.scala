package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Language-model-based quality scoring — the CCNet-style "perplexity
  * filter" step of a training-data pipeline: score every document by the
  * mean negative log-likelihood of its tokens under a unigram model
  * trained on the corpus itself. Low-NLL documents look like the corpus
  * (keep); high-NLL documents are noise/outliers (drop or down-weight).
  * Extension scope: the reference stops at KPI queries; this is the
  * standard corpus-quality signal its documents table feeds.
  */
object LmQueries {

  // ---------------------------------------------------------------- q59
  /** Per-document mean unigram NLL. Model = token → ln(count/total) over
    * the case-folded whitespace corpus (self-trained, so no OOV mass is
    * needed; a held-out model would add one smoothing term to the same
    * plan). Empty documents have no tokens and are excluded — mirrored by
    * the oracle's length guard (the q27 empty-doc convention).
    *
    * Cross-engine determinism: count/total is the same exact double in
    * both engines; ln differs by ≤1 ulp cross-engine, collapsed by
    * round(·,9) per token; the per-doc mean's summation-order jitter is
    * collapsed by round(·,6) — the accepted boundary-odds convention of
    * q33's centroids, certified per-run by the oracle gate.
    *
    * Scale shape: vocab build is one hash agg on token (map-side partials
    * over the exploded scan); total is a 1-row broadcast; scoring is an
    * equi-join of the exploded corpus against the vocab (AQE broadcasts
    * it while it fits, shuffle-join beyond) followed by one hash agg on
    * doc_id. No windows, no driver loops — every stage scales with the
    * token count.
    */
  def q59UnigramNll(spark: SparkSession, dir: String): DataFrame = {
    val d = Kpis.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        tokens(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0)
    val tok = d.select(col("doc_id"), col("lang"),
      size(col("toks")).as("n_tokens"), explode(col("toks")).as("token"))
    val vocab = tok.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    val lp = vocab.crossJoin(broadcast(total))
      .select(col("token"),
        round(log(col("cnt").cast("double") / col("total")), 9).as("lp"))
    tok.join(lp, "token")
      .groupBy(col("doc_id"), col("lang"), col("n_tokens"))
      .agg(round(-avg(col("lp")), 6).as("avg_nll"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("avg_nll"))
      .orderBy("doc_id")
  }

  val q59Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      |  FROM documents WHERE length(trim(text)) > 0),
      |tok AS (
      |  SELECT doc_id, lang, len(toks) AS n_tokens, unnest(toks) AS token
      |  FROM d),
      |vocab AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
      |lp AS (
      |  SELECT token,
      |    round(ln(cnt::DOUBLE / (SELECT SUM(cnt) FROM vocab)), 9) AS lp
      |  FROM vocab)
      |SELECT doc_id, lang, CAST(n_tokens AS INTEGER) AS n_tokens,
      |  round(-avg(lp), 6) AS avg_nll
      |FROM tok JOIN lp USING (token)
      |GROUP BY doc_id, lang, n_tokens
      |ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_unigram_nll" -> (q59UnigramNll _))

  def oracles: Map[String, String] = Map(
    "q59_unigram_nll" -> q59Sql)
}
