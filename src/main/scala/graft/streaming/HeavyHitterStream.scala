package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of q160's heavy-hitter mining: exact per-token running
  * counts in keyed state, emitting ONE alert row the first time a token's
  * cumulative count reaches the threshold. Append-mode
  * `flatMapGroupsWithState` is the fit because the output is an EDGE
  * (first crossing), not a level — a streaming groupBy().count() in
  * update mode would re-emit every changed count and leave the
  * "crossed?" decision to the consumer, and it could never express
  * "exactly once per token".
  *
  * Scale shape: state is one small row (count + fired flag) per DISTINCT
  * token seen, hash-partitioned by token — the streaming analogue of
  * q160's recount side. Within each micro-batch Spark pre-aggregates
  * per-key rows before the state lookup, so per-batch work is bounded by
  * the batch's distinct tokens, not its token instances. Unbounded
  * vocabularies need the same discipline q160 applies map-side: either a
  * state TTL ([[GroupStateTimeout]]) or an upstream Misra-Gries prune of
  * tokens that cannot reach the threshold — both drop only
  * provably-cold keys, leaving every alert intact.
  */
object HeavyHitterStream {

  final case class TokenState(count: Long, alerted: Boolean)
  final case class Alert(token: String, count: Long)

  /** Threshold-crossing alerts over a streaming frame with a string
    * `token` column: one Alert(token, countAtCrossing) per token whose
    * exact running count reaches `threshold`, emitted in the micro-batch
    * where it first crosses and never again. */
  def thresholdAlerts(tokens: DataFrame, threshold: Long): Dataset[Alert] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col("token").cast("string")).as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState[TokenState, Alert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (tok, rows, state) =>
          val prev = state.getOption.getOrElse(TokenState(0L, alerted = false))
          val c = prev.count + rows.size
          val fire = !prev.alerted && c >= threshold
          state.update(TokenState(c, prev.alerted || fire))
          if (fire) Iterator.single(Alert(tok, c)) else Iterator.empty
      }
  }
}
