package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q316's group-sequential monitor (VERDICT r12 #4):
  * the O'Brien-Fleming looks of the experimentation control plane,
  * driven by a live event stream instead of a batch scan.
  *
  * The split follows what each engine is FOR. The stateful hard part —
  * per-user enrollment time and per-look purchase counts, finalized
  * EXACTLY ONCE when the watermark passes the experiment's last cutoff
  * — runs in the stream ([[finalizedUsers]]: one
  * `flatMapGroupsWithState` keyed by user, event-time timeout at c₄,
  * the SpcStream close-of-window contract). The closing global reduce —
  * four moment rows and their z/boundary verdicts — is [[obfLooks]], a
  * BATCH transform over the finalized-user table shared verbatim by the
  * batch backtest and the stream's sink job: a 1-row-per-look reduce
  * over an append-only table is a trivial scheduled query, and keeping
  * it batch-side means the z arithmetic exists in exactly one spelling
  * (a global streaming reduce would also serialize all users through
  * one state key — the single-partition funnel the library bans).
  *
  * Unlike q316 (which derives its cutoffs from the observed time range
  * — a backtest), the stream takes the cutoffs as ARGUMENTS: a live
  * experiment preregisters its calendar; LookStreamSpec proves the
  * replayed stream reproduces q316's registered output row for row when
  * handed q316's derived cutoffs.
  *
  * Scale shape: state is 5 longs per user enrolled within the watermark
  * horizon of c₄, emitted and evicted on the c₄ timeout; within a batch
  * Spark pre-groups rows per user before the state lookup. */
object LookStream {

  final case class EvIn(ts: java.sql.Timestamp, user_id: Long,
      event_type: String)
  final case class LookState(firstT: Long, p1: Long, p2: Long, p3: Long,
      p4: Long)
  final case class UserFinal(user_id: Long, is_a: Boolean, first_t: Long,
      p1: Long, p2: Long, p3: Long, p4: Long)

  /** q129/q314/q316's hash arm, JVM-side: first hex nibble of
    * md5(user_id rendered in decimal) < 0x8 — bit-equal to the SQL
    * `substring(md5(cast(user_id as string)), 1, 1) < '8'` (hex digits
    * '0'..'7' sort below '8', 'a'..'f' above). */
  def armOf(userId: Long): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(userId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) >> 4) & 0xf) < 8
  }

  private def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Finalized per-user experiment rows over a WATERMARKED streaming
    * frame (ts, user_id, event_type): state accumulates the user's
    * first-event time and purchase counts at each of the four
    * preregistered cutoffs `cutsUs` (epoch micros, ascending); the row
    * emits exactly once when the watermark passes c₄. Users whose first
    * event lands after c₄ still emit (on the next watermark advance)
    * with first_t > c₄ — [[obfLooks]]'s enrollment filter excludes them
    * from every look, mirroring q316. */
  def finalizedUsers(events: DataFrame, cutsUs: Seq[Long]): Dataset[UserFinal] = {
    require(cutsUs.length == 4 && cutsUs == cutsUs.sorted,
      s"need 4 ascending cutoffs, got $cutsUs")
    val spark = events.sparkSession
    import spark.implicits._
    val c4Ms = cutsUs(3) / 1000L
    events
      .select(col("ts"), col("user_id").cast("long").as("user_id"),
        col("event_type"))
      .as[EvIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LookState, UserFinal](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[LookState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              UserFinal(uid, armOf(uid), s.firstT, s.p1, s.p2, s.p3, s.p4))
          } else {
            var s = state.getOption
              .getOrElse(LookState(Long.MaxValue, 0L, 0L, 0L, 0L))
            rows.foreach { r =>
              val t = micros(r.ts)
              val p = r.event_type == "purchase"
              s = LookState(math.min(s.firstT, t),
                s.p1 + (if (p && t <= cutsUs(0)) 1L else 0L),
                s.p2 + (if (p && t <= cutsUs(1)) 1L else 0L),
                s.p3 + (if (p && t <= cutsUs(2)) 1L else 0L),
                s.p4 + (if (p && t <= cutsUs(3)) 1L else 0L))
            }
            state.update(s)
            // fire once the watermark passes the experiment end; for
            // stragglers first seen after c4 the timeout must still be
            // ahead of the current watermark or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(c4Ms + 1L, state.getCurrentWatermarkMs() + 1L))
            Iterator.empty
          }
      }
  }

  /** The four-look O'Brien-Fleming table from a finalized-user frame
    * (user_id, is_a, first_t, p1..p4) — q316's moment chain and
    * boundaries, output (look, information_frac, n_enrolled, z,
    * obf_boundary, stop). Shared by the batch backtest and the
    * streaming sink's closing reduce, so the z arithmetic has one
    * spelling; every sum is over exact longs, so batch and stream
    * agree bit-for-bit whenever their finalized-user ROWS agree. */
  def obfLooks(perUser: DataFrame, cutsUs: Seq[Long]): DataFrame = {
    require(cutsUs.length == 4)
    val momentAggs = (1 to 4).flatMap { k =>
      val enrolled = col("first_t") <= lit(cutsUs(k - 1))
      def arm(a: Boolean, tag: String) = Seq(
        sum(when(enrolled && col("is_a") === a, 1L).otherwise(0L))
          .as(s"n_${tag}_$k"),
        sum(when(enrolled && col("is_a") === a, col(s"p$k"))
          .otherwise(0L)).as(s"s_${tag}_$k"),
        sum(when(enrolled && col("is_a") === a,
          col(s"p$k") * col(s"p$k")).otherwise(0L)).as(s"ss_${tag}_$k"))
      arm(a = true, "a") ++ arm(a = false, "b")
    }
    val moments = perUser.agg(momentAggs.head, momentAggs.tail: _*)
    val bounds = Map(1 -> 4.048, 2 -> 2.862, 3 -> 2.337, 4 -> 2.024)
    def zAt(k: Int) = {
      def d(c: String) = col(s"${c}_$k").cast("double")
      val va = (d("ss_a") - d("s_a") * d("s_a") / d("n_a")) /
        (d("n_a") - lit(1.0))
      val vb = (d("ss_b") - d("s_b") * d("s_b") / d("n_b")) /
        (d("n_b") - lit(1.0))
      (d("s_a") / d("n_a") - d("s_b") / d("n_b")) /
        sqrt(va / d("n_a") + vb / d("n_b"))
    }
    (1 to 4).map { k =>
      moments.select(lit(k.toLong).as("look"),
        lit(k * 0.25).as("information_frac"),
        (col(s"n_a_$k") + col(s"n_b_$k")).as("n_enrolled"),
        zAt(k).as("z"),
        lit(bounds(k)).as("obf_boundary"),
        (abs(zAt(k)) > lit(bounds(k))).as("stop"))
    }.reduce(_ unionByName _).orderBy("look")
  }
}
