package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of q367's conformal gate — the live anomaly screen a
  * certified interval exists FOR: line items arriving on a stream are
  * checked against the frozen point model and conformal radius, and
  * rows outside ±q̂ are flagged in-flight (price inconsistent with
  * quantity beyond the certified 90% band — miskeys, unit confusion,
  * adversarial rows). The q367 split applied to streaming: (β, q̂) is
  * the frozen artifact (models re-fit by release, not by micro-batch),
  * captured as ONE collected row at query start (the ContamStream
  * preregistered-artifact discipline). A row's verdict depends on
  * nothing but that row and the frozen pair, so the stream is fully
  * STATELESS — a filter with two broadcast-closure longs, no state
  * store, no watermark, unlimited parallelism.
  *
  * Scale shape: per row, two integer multiplies and one compare; zero
  * shuffle, zero state. The conformal guarantee transfers exactly:
  * under exchangeability ≤10% of in-distribution rows flag. */
object ConformalStream {

  final case class LineIn(okey: Long, lnum: Int, y_cents: Long, qty: Long)
  final case class Flagged(okey: Long, lnum: Int, y_cents: Long, qty: Long,
      resid_millicents: Long, qhat_millicents: Long)

  /** The frozen (β, q̂) pair from q367's calibration half. */
  def fitFromDir(spark: SparkSession, dir: String): (Long, Long) = {
    val r = graft.queries.ExperimentQueries.conformalFit(spark, dir)
      .collect().head
    (r.getAs[Long]("beta"), r.getAs[Long]("qhat"))
  }

  /** Flag stream rows outside the certified interval. Emits one
    * [[Flagged]] row per violation; conforming rows pass silently. */
  def flags(lines: DataFrame, beta: Long, qhat: Long): Dataset[Flagged] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.select(col("okey").cast("long"), col("lnum").cast("int"),
      col("y_cents").cast("long"), col("qty").cast("long"))
      .as[LineIn]
      .flatMap { l =>
        val resid = math.abs(l.y_cents * 1000L - beta * l.qty)
        if (resid > qhat)
          Iterator.single(
            Flagged(l.okey, l.lnum, l.y_cents, l.qty, resid, qhat))
        else Iterator.empty
      }
  }
}
