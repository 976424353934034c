package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting: the standard two-stage rewrite for
  * aggregations whose key distribution is pathological (one key holding a
  * large fraction of all rows ⇒ one reducer task holding the job hostage).
  *
  * Stage 1 groups on (key, salt) — the hot key's rows spread over
  * `saltBuckets` tasks and combine map-side; stage 2 merges the ≤
  * `saltBuckets` partial rows per key. Total shuffle volume grows by at
  * most a factor of buckets on the PARTIAL rows (tiny), while the max
  * task size shrinks by the same factor on the raw rows (huge).
  *
  * Note Spark's hash aggregate already does partial+final combining, which
  * handles most groupBy skew on its own; explicit salting earns its keep
  * for high-cardinality-payload aggregations (collect_list/distinct-heavy)
  * and as the building block of salted JOINS (replicate the small side per
  * salt). AQE's skew-join handling covers the sort-merge-join case at
  * runtime; this utility is the plan-level tool.
  */
object Salting {

  /** Two-stage salted sum/count aggregation: returns one row per key with
    * `sum(valueCol)` and `count(*)`, computed via (key, salt) partials.
    * Deterministic: the salt is a hash of stable columns, not rand(). */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     saltCol: Column, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(saltCol), lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n_rows"))
  }

  /** q43: the salted rewrite on a genuinely pathological distribution —
    * lineitem grouped by `l_returnflag` (3 distinct keys over every row, so
    * a plain final aggregate lands ~1/3 of the table on each of THREE
    * reducer tasks no matter how many cores exist). The salt spreads each
    * key over 32 buckets; stage 2 merges ≤32 partial rows per key.
    *
    * Values are summed as DECIMAL(18,4) so the two-stage regroup is exact
    * (decimal addition is associative; a double sum would hash-diverge from
    * the oracle under regrouping), then cast to double for the output —
    * the same parity convention as Kpis q1/q7.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_salted_sum" -> ((spark: SparkSession, dir: String) => {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_returnflag"),
          col("l_quantity").cast("decimal(18,4)").as("qty"),
          col("l_orderkey"), col("l_linenumber"))
      saltedSumCount(li, "l_returnflag", "qty",
          struct(col("l_orderkey"), col("l_linenumber")), saltBuckets = 32)
        .select(col("l_returnflag"),
          col("sum_qty").cast("double").as("sum_qty"),
          col("n_rows"))
        .orderBy("l_returnflag")
    }))

  def oracles: Map[String, String] = Map(
    "q43_salted_sum" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
}
