package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-side warehouse sink: date-partitioned parquet. The reference's
  * warehouse is Postgres with a B-tree on `sale_date`
  * (`sql/create_tables.sql:13`); in-engine, the partition column IS the
  * index — a `sale_day = …` or range predicate prunes whole directories
  * before any I/O (visible as `PartitionFilters` in the scan node).
  *
  * Scale notes: partitioning by day bounds files-per-partition at any
  * volume (a day of a 100 TB/year feed is ~270 GB → a few hundred
  * size-split files); `maxRecordsPerFile` caps individual file size
  * without a shuffle. Writes are append-mode and idempotent at the
  * file-task level via Spark's commit protocol; cross-batch dedup stays
  * the JDBC upsert's job ([[Upsert]]) or a downstream compaction's.
  */
object Warehouse {

  val PartitionCol = "sale_day"

  /** `format`: "parquet" (default) or "orc" — both columnar, both
    * predicate-pushdown- and partition-pruning-capable; ORC is the
    * interchange format when the downstream warehouse is Hive/Trino
    * ORC-native. Same layout contract either way. */
  def writeSales(df: DataFrame, path: String, mode: String = "append",
                 format: String = "parquet"): Unit =
    df.withColumn(PartitionCol, to_date(col("sale_date")))
      .write
      .partitionBy(PartitionCol)
      .option("maxRecordsPerFile", 5000000)
      .mode(mode)
      .format(format)
      .save(path)

  def readSales(spark: SparkSession, path: String,
                format: String = "parquet"): DataFrame =
    spark.read.format(format).load(path)

  /** A `Router.runBatch` load function writing to the lake. */
  def loader(path: String): DataFrame => Long = { df =>
    val n = df.count()
    writeSales(df, path)
    n
  }

  /** Bucketed warehouse table: hash-bucket the data on its join/agg key at
    * WRITE time so every later join between co-bucketed tables and every
    * aggregation on the bucket key runs shuffle-free — the scan itself
    * satisfies the required hash distribution (and, via sortBy, the sort
    * order). This is the 100 TB answer to "the same fact/dim join runs
    * every hour": pay the shuffle once at load, never again at query time.
    * The spec asserts the plan property: a join of two co-bucketed tables
    * contains NO Exchange. `path` makes the table external so tests (and
    * lakes) control the location. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, nBuckets: Int,
                    mode: String = "overwrite"): Unit =
    // Align rows to their bucket BEFORE the bucketed write (r17, guide
    // §6 small-files): repartition(n, col) and bucketBy(n, col) use the
    // same murmur3-pmod placement, so each writer task holds exactly one
    // bucket and emits exactly one file. Without it every upstream task
    // writes a sliver of every bucket — tasks × buckets tiny files
    // (measured 227 files for one 8-bucket band store at sf0.1; now 8),
    // paying file-open overhead on every later probe scan. Write
    // parallelism = bucket count, which is what one-file-per-bucket
    // means; production sizes nBuckets to the estate, not the fixture.
    df.repartition(nBuckets, col(bucketCol))
      .write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .mode(mode)
      .format("parquet")
      .saveAsTable(table)

  /** Compact one day-partition to `targetFiles` files — the maintenance
    * pass for the small-files problem every incremental lake accumulates
    * (each micro-batch appends its own files; scan overhead grows with
    * file count, not data size). Single-writer maintenance window, but the
    * swap keeps a recoverable copy at every step: stage the compacted data,
    * rename the live partition aside as a backup, rename staged into place,
    * THEN delete the backup — a crash at any point leaves either the live
    * dir or the backup dir holding a complete copy (delete-before-rename
    * would open a window where the partition exists nowhere visible). */
  def compactDay(spark: SparkSession, path: String, day: String,
                 targetFiles: Int = 1): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDir = new org.apache.hadoop.fs.Path(s"$path/$PartitionCol=$day")
    val staged = new org.apache.hadoop.fs.Path(s"$path/.compact_$day")
    val backup = new org.apache.hadoop.fs.Path(s"$path/.compact_backup_$day")
    val df = spark.read.parquet(partDir.toString)
    df.repartition(targetFiles).write.mode("overwrite").parquet(staged.toString)
    fs.delete(backup, true) // stale leftover from a prior crashed run
    if (!fs.rename(partDir, backup))
      throw new java.io.IOException(s"compaction backup rename failed for $day")
    if (!fs.rename(staged, partDir)) {
      fs.rename(backup, partDir) // restore the live partition
      throw new java.io.IOException(s"compaction swap failed for $day")
    }
    fs.delete(backup, true)
  }
}
