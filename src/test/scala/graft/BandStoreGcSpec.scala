package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.operators.IncrementalDedup
import graft.queries.CompactionQueries
import graft.sink.Warehouse

/** The persisted-store half of q340 (VERDICT r13 #3): q340 certifies
  * the drop set in-plan; this spec writes the q98 band store for real
  * (bucketed on band_hash), applies the GC as an anti-join delete into
  * the next store generation, re-runs the q98 probe on the compacted
  * store, and asserts the probe VERDICT (per incoming doc: flagged or
  * clean) is identical pre/post GC — non-trivially, because the probe's
  * pre-GC verified partners include rows the GC dropped. Also pins the
  * layout contract: the compacted generation keeps the bucket set and
  * the probe's candidate join stays store-side shuffle-free.
  *
  * Fixture: 20 disjoint-token base docs; docs 3/6/9 each carry two
  * near-clones (ids +100/+200, J = 0.75 to the base) forming three
  * adjudicated clusters with canonical = min id. The probe batch is a
  * clone of cluster 3's text (must flag, pre AND post) plus a novel
  * doc (must stay clean). */
class BandStoreGcSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val Buckets = IncrementalDedup.StoreBuckets

  private def docText(i: Int): String =
    (1 to 8).map(j => s"tok${j}_$i").mkString(" ")

  private def shOf(df: DataFrame): DataFrame =
    df.select(col("doc_id"), shingles(tokens(col("text")), 3).as("sh"))

  // q98's store layout: bucket_key = band ':' band_hash, one column
  // carrying the full collision identity (the single-key spelling that
  // keeps the bucketed probe join store-side shuffle-free)
  private def bandsOf(df: DataFrame): DataFrame =
    shOf(df)
      .withColumn("sig", minhashSignature(col("sh"), 16))
      .select(col("doc_id"), explode(minhashBands(col("sig"), 8, 2)).as("b"))
      .select(concat_ws(":", col("b.band"), col("b.band_hash"))
        .as("bucket_key"), col("doc_id"))

  // corpus: 20 base docs + 2 near-clones each of docs 3, 6, 9
  private lazy val corpus = {
    val base = (1 to 20).map(i => (i.toLong, docText(i)))
    val clones = Seq(3, 6, 9).flatMap(i => Seq(
      (i + 100L, docText(i) + " extra tail"),
      (i + 200L, docText(i) + " extra tail")))
    (base ++ clones).toDF("doc_id", "text")
  }
  private lazy val clusters = Seq(3, 6, 9)
    .flatMap(i => Seq((i + 100L, i.toLong), (i + 200L, i.toLong)))
    .toDF("doc_id", "canon")
  private lazy val probeBatch = Seq(
    (1003L, docText(3) + " extra tail"), // near-dup of cluster 3
    (2001L, (1 to 8).map(j => s"novel${j}_x").mkString(" ")))
    .toDF("doc_id", "text")

  /** q98's probe against a given store generation: band-collide, dedup
    * bare id pairs, exact-Jaccard verify — returns the verified pair
    * set (store doc, probe doc). */
  private def probePairs(store: DataFrame): DataFrame = {
    val cand = candJoin(store)
      .select(col("a_id"), col("b_id")).distinct()
    cand
      .join(shOf(corpus).select(col("doc_id").as("a_id"),
        col("sh").as("a_sh")), "a_id")
      .join(shOf(probeBatch).select(col("doc_id").as("b_id"),
        col("sh").as("b_sh")), "b_id")
      .filter(jaccard(col("a_sh"), col("b_sh")) >= 0.5)
      .select(col("a_id"), col("b_id"))
  }

  /** q98's candidate join: keyed on the bucket column alone, so the
    * bucketed store scan satisfies the join's distribution itself. */
  private def candJoin(store: DataFrame): DataFrame =
    store.withColumnRenamed("doc_id", "a_id")
      .join(bandsOf(probeBatch).withColumnRenamed("doc_id", "b_id"),
        Seq("bucket_key"))

  private def verdicts(store: DataFrame): Map[Long, Boolean] = {
    val flagged = probePairs(store).select(col("b_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    probeBatch.collect().map(_.getLong(0))
      .map(id => id -> flagged.contains(id)).toMap
  }

  private lazy val fixture: (String, String) = {
    val base = Files.createTempDirectory("graft-bandgc")
    val (t, tGc) = ("band_gc_store_t1", "band_gc_store_t1_gc")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"DROP TABLE IF EXISTS $tGc")
    Warehouse.writeBucketed(bandsOf(corpus), t,
      base.resolve("s").toString, "bucket_key", Buckets)
    CompactionQueries.compactStore(spark, t, base.resolve("s").toString,
      clusters, tGc, base.resolve("s_gc").toString, Buckets)
    (t, tGc)
  }

  test("GC drops covered clone rows and ONLY those (reconciliation)") {
    val (t, tGc) = fixture
    val before = spark.table(t)
    val after = spark.table(tGc)
    val dropped = CompactionQueries.gcDropRows(before, clusters)
    assert(before.count() == after.count() + dropped.count(),
      "rows_before - rows_dropped must equal rows_after")
    assert(dropped.count() > 0, "the fixture's clones must yield drops")
    // every dropped row belongs to a non-canonical cluster member
    val droppedIds = dropped.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(droppedIds.forall(_ > 100L))
    // base (canonical / unclustered) rows all survive
    assert(after.filter(col("doc_id") <= 20L).count() ==
      before.filter(col("doc_id") <= 20L).count())
  }

  test("the distinct bucket set survives compaction intact") {
    val (t, tGc) = fixture
    val bb = spark.table(t).select("bucket_key").distinct()
    val ba = spark.table(tGc).select("bucket_key").distinct()
    assert(bb.exceptAll(ba).count() == 0 && ba.exceptAll(bb).count() == 0,
      "compaction must not orphan or invent any (band, bucket)")
  }

  test("probe verdicts are identical pre/post GC, through dropped partners") {
    val (t, tGc) = fixture
    val pre = verdicts(spark.table(t))
    val post = verdicts(spark.table(tGc))
    assert(pre == post, s"verdict drift across GC: pre=$pre post=$post")
    assert(pre(1003L), "the cluster-3 clone must flag")
    assert(!pre(2001L), "the novel doc must stay clean")
    // non-triviality: pre-GC the probe verified against clone rows the
    // GC removed; post-GC the canonical alone carries the verdict
    val prePartners = probePairs(spark.table(t))
      .filter(col("b_id") === 1003L).select("a_id")
      .collect().map(_.getLong(0)).toSet
    val postPartners = probePairs(spark.table(tGc))
      .filter(col("b_id") === 1003L).select("a_id")
      .collect().map(_.getLong(0)).toSet
    assert(postPartners.subsetOf(prePartners))
    assert(postPartners.contains(3L),
      "the canonical must remain a verified partner after GC")
  }

  test("post-GC probe candidate join is store-side shuffle-free") {
    val (_, tGc) = fixture
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cand = candJoin(spark.table(tGc))
      val plan = cand.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"expected exactly one Exchange (probe side), got $exchanges in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
