package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over the events stream: resample a sparse
  * event series onto a dense per-key hourly grid (gap-fill) and carry the
  * last observation forward across the gaps — the standard prep step
  * before any windowed/sequential model consumes an irregular series.
  */
object SeriesQueries {

  // ---------------------------------------------------------------- q62
  /** Dense hourly grid per event_type for the sparse high-value
    * (value > 190) event series: each type's [first, last] active hour is
    * expanded with `sequence`, missing hours join as NULL and become
    * (n_events = 0, was_gap = true), and the hourly average carries
    * forward via last-non-null over an ordered window.
    *
    * Cross-engine parity: the hourly average uses the exact
    * decimal-sum→double convention (q7/q13), so forward-filled values are
    * bit-identical; hours hash as formatted strings (q13's convention).
    *
    * Scale shape: one hash agg on (type, hour); the span table is one row
    * per key (broadcast); the grid explode generates rows proportional to
    * the OUTPUT, not the input; fill is one window shuffle on the key.
    * Keys process independently — a year of hours per key is ~9k rows,
    * bounded regardless of input volume.
    */
  def q62GapFill(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Kpis.eventsTable(spark, dir)
      .filter(col("value") > 190)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("value").cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("avg_value"))
    val grid = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("h"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("avg_value"), ignoreNulls = true).over(w).as("filled_avg"),
        col("n_events").isNull.as("was_gap"))
      .orderBy("event_type", "hour")
  }

  val q62Sql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_value
      |  FROM events WHERE value > 190 GROUP BY 1, 2),
      |grid AS (
      |  SELECT event_type,
      |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |  FROM (SELECT event_type, min(h) AS h0, max(h) AS h1
      |        FROM hourly GROUP BY 1))
      |SELECT g.event_type,
      |  strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
      |  COALESCE(n, 0) AS n_events,
      |  last_value(avg_value IGNORE NULLS) OVER (
      |    PARTITION BY g.event_type ORDER BY g.h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg,
      |  n IS NULL AS was_gap
      |FROM grid g LEFT JOIN hourly USING (event_type, h)
      |ORDER BY event_type, hour""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_gap_fill" -> (q62GapFill _))

  def oracles: Map[String, String] = Map(
    "q62_gap_fill" -> q62Sql)
}
