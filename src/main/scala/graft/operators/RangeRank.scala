package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed rank / running-sum / NTILE over a total order —
  * the partitioned replacement for the "one big ORDER BY window"
  * chokepoint (VERDICT r11 #6).
  *
  * Every method here computes EXACT results (bit-identical to the
  * single-partition window formulation, hence to a SQL oracle) with no
  * stage ever holding more than one range partition:
  *
  *  1. `repartitionByRange` on the sort keys — Spark samples range
  *     bounds and hash-free-shuffles rows so partition i holds a
  *     contiguous key range, partitions ordered by `spark_partition_id`.
  *  2. Per-partition COUNT/SUM — a metadata-sized frame (one row per
  *     partition) from which each partition's global offset is a prefix
  *     sum; the prefix window's input is ≤ the partition count, i.e.
  *     cluster-metadata scale, never data scale.
  *  3. A PARTITIONED window (`partitionBy(partition_id)`) computes local
  *     row_number / running sums in parallel; the broadcast offset join
  *     lifts them to exact global values.
  *
  * Total cost: one range shuffle + one hash shuffle of the input, both
  * linear and fully parallel — vs. the single-partition window's total
  * serialization. The caller's `keys` MUST be a total order (include a
  * unique tiebreak column): ranks are then deterministic and NTILE
  * assignment matches SQL exactly.
  *
  * The input frame is eagerly materialized once (`localCheckpoint`) so
  * the per-partition stats pass and the rank pass share one computation
  * of the (typically aggregated, entity-scale) upstream plan rather than
  * recomputing it — the q53 convention.
  */
object RangeRank {

  private val Pid = "rr_pid"

  /** Range-spread `df` on `keys` and tag rows with their physical
    * partition id; eagerly materialized so both downstream passes reuse
    * it. */
  private def ranged(df: DataFrame, keys: Seq[Column]): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.repartitionByRange(par, keys: _*)
      .withColumn(Pid, spark_partition_id())
      .localCheckpoint(true)
  }

  /** Per-partition (count, sum) and their exclusive prefix offsets.
    * `valueCol` None ⇒ sums are omitted. The prefix window runs over at
    * most `defaultParallelism` rows — metadata scale by construction.
    * The per-partition count `rr_n` is KEPT (r17): Σ rr_n is the exact
    * global row count, which lets [[withNtile]]/[[quantiles]] read their
    * totals off this metadata frame instead of re-counting the ranked
    * data frame (an extra full pass + offsets join per call). */
  private def offsets(r: DataFrame, valueCol: Option[Column]): DataFrame = {
    val aggs = count(lit(1)).as("rr_n") +:
      valueCol.map(v => sum(v).as("rr_s")).toSeq
    val byPid = r.groupBy(col(Pid)).agg(aggs.head, aggs.tail: _*)
    val prev = Window.orderBy(col(Pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCnt = byPid.withColumn("rr_cnt_off",
      coalesce(sum(col("rr_n")).over(prev), lit(0L)))
    val full =
      if (valueCol.isEmpty) withCnt
      else withCnt.withColumn("rr_sum_off",
        coalesce(sum(col("rr_s")).over(prev), lit(0L)))
    full.drop("rr_s")
  }

  /** Add `rankCol`: the exact 1-based global rank of each row under the
    * total order `keys`. */
  def withGlobalRank(df: DataFrame, rankCol: String, keys: Seq[Column]): DataFrame = {
    val r = ranged(df, keys)
    rankOver(r, rankCol, keys, offsets(r, None))
  }

  /** The rank join over an already-ranged frame and its offsets frame —
    * factored out so [[withNtile]]/[[quantiles]] can reuse ONE offsets
    * plan for both the rank lift and their row-count total. */
  private def rankOver(r: DataFrame, rankCol: String, keys: Seq[Column],
      off: DataFrame): DataFrame = {
    val local = Window.partitionBy(col(Pid)).orderBy(keys: _*)
    r.withColumn("rr_local", row_number().over(local).cast("long"))
      .join(broadcast(off), Pid)
      .withColumn(rankCol, col("rr_local") + col("rr_cnt_off"))
      .drop(Pid, "rr_local", "rr_cnt_off", "rr_n")
  }

  /** Add `outCol`: the exact running sum of `value` (current row
    * INCLUSIVE) in `keys` order — the distributed form of
    * `sum(value) OVER (ORDER BY keys ROWS UNBOUNDED PRECEDING)`. */
  def withRunningSum(df: DataFrame, value: Column, outCol: String,
      keys: Seq[Column]): DataFrame = {
    val r = ranged(df, keys)
    val local = Window.partitionBy(col(Pid)).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.withColumn("rr_lsum", sum(value).over(local))
      .join(broadcast(offsets(r, Some(value))), Pid)
      .withColumn(outCol, col("rr_lsum") + col("rr_sum_off"))
      .drop(Pid, "rr_lsum", "rr_cnt_off", "rr_sum_off", "rr_n")
  }

  /** Add `outCol`: the exact running MAX of `value` (current row
    * INCLUSIVE) in `keys` order — the distributed form of
    * `max(value) OVER (ORDER BY keys ROWS UNBOUNDED PRECEDING)`.
    * Same discipline as [[withRunningSum]]: partitioned local cummax +
    * a broadcast exclusive-prefix max per range partition (max is
    * associative, so prefix-combining per-partition maxima is exact).
    * The prefix for the first partition is NULL; `greatest` skips NULLs,
    * matching the window semantics (max over an empty prefix
    * contributes nothing).
    *
    * `inclusive = false` gives the EXCLUSIVE form — `ROWS BETWEEN
    * UNBOUNDED PRECEDING AND 1 PRECEDING` — which is NULL on the global
    * first row, exactly like the window it replaces; record/high-water
    * detection (is this row strictly above everything before it?) needs
    * this form, since an inclusive max can never distinguish the first
    * achiever of a value from a later tie. */
  def withRunningMax(df: DataFrame, value: Column, outCol: String,
      keys: Seq[Column], inclusive: Boolean = true): DataFrame = {
    val r = ranged(df, keys)
    val local = Window.partitionBy(col(Pid)).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding,
        if (inclusive) Window.currentRow else -1)
    val byPid = r.groupBy(col(Pid)).agg(max(value).as("rr_m"))
    val prev = Window.orderBy(col(Pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = byPid
      .withColumn("rr_max_off", max(col("rr_m")).over(prev))
      .drop("rr_m")
    r.withColumn("rr_lmax", max(value).over(local))
      .join(broadcast(off), Pid)
      .withColumn(outCol, greatest(col("rr_lmax"), col("rr_max_off")))
      .drop(Pid, "rr_lmax", "rr_max_off")
  }

  /** Exact type-1 (order-statistic) quantiles of `value` at the given
    * per-mille points: for each p = k/1000 the value whose exact global
    * rank is ⌈p·n⌉ — computed with INTEGER arithmetic
    * ((n·k + 999) div 1000), so no float decides a rank boundary.
    * Returns (pct: double, rank, n, value) rows, one per requested
    * point. `keys` must extend `value` to a total order (unique
    * tiebreaks), exactly like [[withGlobalRank]].
    *
    * This is the EXACT fact-scale quantile path (range shuffle +
    * broadcast target join); the mergeable-sketch path (q117) is the
    * approximate alternative when one pass over unsorted data must
    * also serve other aggregations. */
  def quantiles(df: DataFrame, value: Column, keys: Seq[Column],
      permille: Seq[Int]): DataFrame = {
    require(permille.nonEmpty && permille.forall(k => k >= 1 && k <= 1000),
      s"per-mille points must be in [1,1000]: $permille")
    val spark = df.sparkSession
    val v = df.select(value.as("rr_v") +: keys: _*)
    val vk = col("rr_v") +: keys
    val r = ranged(v, vk)
    val off = offsets(r, None)
    val ranked = rankOver(r, "rr_rk", vk, off)
    // r17: the total is Σ rr_n off the metadata-scale offsets frame —
    // previously `v.agg(count)` re-evaluated the caller's UPSTREAM plan
    // (v is pre-checkpoint), paying a second full pass for one number.
    val tot = off.agg(sum(col("rr_n")).as("rr_n"))
    val targets = spark.range(1)
      .select(explode(array(permille.map(lit(_)): _*)).as("rr_k"))
      .crossJoin(broadcast(tot))
      .select(col("rr_k"), col("rr_n"),
        expr("(rr_n * rr_k + 999) div 1000").as("rr_target"))
    ranked.join(broadcast(targets), col("rr_rk") === col("rr_target"))
      .select(
        (col("rr_k").cast("double") / lit(1000.0)).as("pct"),
        col("rr_target").as("rank"), col("rr_n").as("n"),
        col("rr_v").as("value"))
  }

  /** Add `ntileCol` with SQL NTILE(n) semantics over the total order
    * `keys`: bucket sizes differ by at most one, larger buckets first —
    * derived arithmetically from the exact global rank, so the result is
    * bit-identical to `NTILE(n) OVER (ORDER BY keys)` while never
    * running a single-partition window. */
  def withNtile(df: DataFrame, ntileCol: String, n: Int,
      keys: Seq[Column]): DataFrame = {
    require(n >= 1, s"ntile bucket count must be >= 1: $n")
    val rankCol = "rr_rank"
    val r = ranged(df, keys)
    val off = offsets(r, None)
    val ranked = rankOver(r, rankCol, keys, off)
    // r17: Σ rr_n off the metadata-scale offsets frame — previously
    // `ranked.agg(count)` re-scanned the checkpointed frame and re-ran
    // the offsets join once more per withNtile call, for one number.
    val total = off.agg(sum(col("rr_n")).as("rr_total"))
    // SQL NTILE: small = total div n buckets of size `small`, after
    // (total mod n) buckets of size small+1. CASE branches evaluate
    // lazily, so the `small`-division is never reached when small = 0
    // (n >= total ⇒ every rank lands in the first branch).
    ranked.crossJoin(broadcast(total))
      .withColumn(ntileCol, expr(
        s"""CASE WHEN $rankCol <= (rr_total % $n) * (rr_total div $n + 1)
           |  THEN ($rankCol - 1) div (rr_total div $n + 1) + 1
           |  ELSE (rr_total % $n) +
           |    ($rankCol - 1 - (rr_total % $n) * (rr_total div $n + 1))
           |      div (rr_total div $n) + 1
           |END""".stripMargin).cast("int"))
      .drop(rankCol, "rr_total")
  }
}
