package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim

/** Broadcast-Bloom semi-join pruning — the scale pattern for "is this row
  * in that set?" when the set is too large to broadcast as a hash
  * relation but its BLOOM FILTER is not. A benchmark/contamination set of
  * ~10⁷ shingles costs hundreds of MB as a broadcast hash table yet only
  * a few MB as a bloom filter; with the bloom broadcast, the 100 TB probe
  * side is pruned MAP-SIDE at the scan (zero shuffle for the ~all of the
  * corpus that misses), and only the survivors — true hits plus the small
  * false-positive mass — pay the exact verification join. The exact
  * verify makes the pipeline's RESULT independent of the bloom: the bloom
  * can only let extra rows through to verification, never drop a true
  * hit (no false negatives by construction), so correctness is identical
  * to the plain semi-join and the bloom is pure plan optimization.
  *
  * Built on Spark's own sketch machinery (the codegen'd
  * `BloomFilterAggregate` / `might_contain` pair that powers AQE
  * runtime row-level filtering), reached through [[ColumnShim]] like the
  * other native expressions. Keys are `xxhash64`'d on both sides before
  * the bloom — the bloom stores 64-bit hashes regardless, and hashing
  * up front keeps arbitrarily wide string keys out of the sketch path.
  */
object BloomPrune {

  /** 1-row, 1-column ("bloom") DataFrame: the bloom filter of
    * `xxhash64(key)` over `df`. Size the parameters to the SET being
    * sketched (expectedItems ≈ its cardinality; numBits ≈ 8–10× that
    * for a ~2% false-positive rate). */
  def bloomOf(df: DataFrame, key: Column,
              expectedItems: Long, numBits: Long): DataFrame = {
    val agg = new BloomFilterAggregate(
      ColumnShim.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    df.agg(ColumnShim.column(agg).as("bloom"))
  }

  /** `might_contain(<scalar-subquery bloom>, xxhash64(key))` probe
    * predicate. `might_contain` demands its bloom operand be a constant
    * or a scalar subquery (never a joined column) — this is the same
    * `BloomFilterMightContain(ScalarSubquery(Aggregate(...)), XxHash64)`
    * shape Spark's AQE runtime-filter injection builds internally; the
    * subquery executes once and broadcasts its result to the probe
    * side's tasks. */
  def mightContain(bloomDF: DataFrame, key: Column): Column =
    ColumnShim.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
          bloomDF.queryExecution.analyzed),
        ColumnShim.expression(xxhash64(key))))

  /** Semi-join `left` to `right` on equal `keyName`, bloom-pruned:
    * the bloom of the right side rides a scalar subquery into a
    * map-side filter on the left, then the survivors are exact-verified
    * with a real semi-join (strategy left to AQE — at scale this is a
    * shuffle join of only the pruned remnant, not the full probe
    * side). */
  def prunedSemiJoin(left: DataFrame, right: DataFrame, keyName: String,
                     expectedItems: Long, numBits: Long): DataFrame = {
    val bloom = bloomOf(right, col(keyName), expectedItems, numBits)
    left.filter(mightContain(bloom, col(keyName)))
      .join(right.select(col(keyName)).distinct(), Seq(keyName), "leftsemi")
  }
}
