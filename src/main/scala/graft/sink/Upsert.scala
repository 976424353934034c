package graft.sink

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.util.LongAccumulator

import scala.util.control.NonFatal

/** JDBC upsert sink — the warehouse leg of the pipeline (reference
  * `dags/src/db.py:22-67`): batched `INSERT ... ON CONFLICT (key) DO UPDATE
  * SET col = EXCLUDED.col`, batch size 1000, transaction-per-partition with
  * rollback on failure.
  *
  * Spark's own `DataFrameWriter.jdbc` cannot upsert, so this is a
  * `foreachPartition` writer: each partition opens one connection, streams
  * its rows into a prepared statement in `batchSize` chunks, and commits
  * once — at 1000 executors that is 1000 parallel COPY-like streams, the
  * standard scalable JDBC pattern (cap parallelism with
  * `df.coalesce(n)` if the warehouse needs fewer writers).
  *
  * SQL-text generation and batching logic are pure functions, unit-tested
  * without a live database; only [[upsert]] touches JDBC.
  */
object Upsert {

  /** Postgres-dialect upsert statement with `?` placeholders
    * (`db.py:42-51`). */
  def upsertSql(table: String, cols: Seq[String], conflictKey: String): String = {
    require(cols.contains(conflictKey), s"conflict key $conflictKey not in $cols")
    val updates = cols.filterNot(_ == conflictKey)
      .map(c => s"$c = EXCLUDED.$c").mkString(",\n      ")
    s"""INSERT INTO $table (${cols.mkString(", ")})
       |VALUES (${cols.map(_ => "?").mkString(", ")})
       |ON CONFLICT ($conflictKey) DO UPDATE
       |  SET $updates""".stripMargin
  }

  /** Pure partition-local batching: feed `rows` to `exec` in chunks of
    * `batchSize`; returns rows seen. Mirrors `execute_values(page_size=…)`
    * (`db.py:56`). */
  def batched[T](rows: Iterator[T], batchSize: Int)(exec: Seq[T] => Unit): Long = {
    require(batchSize > 0)
    var n = 0L
    rows.grouped(batchSize).foreach { chunk =>
      exec(chunk)
      n += chunk.size
    }
    n
  }

  /** Distributed upsert of `df` into `table`. One transaction per partition
    * (commit at partition end, rollback + rethrow on failure — Spark's task
    * retry then re-runs the partition; ON CONFLICT makes the retry
    * idempotent, the same at-least-once + idempotent-write contract as the
    * reference). Returns total rows written.
    *
    * `sqlOverride` swaps the statement text (same `?`-per-column binding
    * order) for non-Postgres dialects — also how the embedded-Derby
    * integration test drives this exact partition/batch/transaction path.
    * `paramOrder` remaps placeholders to row-column indices for dialects
    * whose upsert statement must BIND A COLUMN MORE THAN ONCE (standard
    * SQL MERGE repeats the key in the ON clause and the INSERT arm;
    * Postgres ON CONFLICT does not) — None keeps the one-?-per-column
    * order. */
  def upsert(df: DataFrame, url: String, props: Properties, table: String,
             conflictKey: String, batchSize: Int = 1000,
             sqlOverride: Option[String] = None,
             paramOrder: Option[Seq[Int]] = None): Long = {
    val cols = df.columns.toSeq
    val sql = sqlOverride.getOrElse(upsertSql(table, cols, conflictKey))
    val order = paramOrder.getOrElse(cols.indices)
    val acc: LongAccumulator =
      df.sparkSession.sparkContext.longAccumulator("upserted_rows")
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          val n = batched(rows, batchSize) { chunk =>
            chunk.foreach { r =>
              order.zipWithIndex.foreach { case (ci, pi) =>
                st.setObject(pi + 1, r.get(ci))
              }
              st.addBatch()
            }
            st.executeBatch()
          }
          conn.commit()
          acc.add(n)
        } catch {
          case NonFatal(e) =>
            try conn.rollback() catch { case NonFatal(_) => () }
            throw e
        } finally conn.close()
      }
    }
    acc.value
  }
}

/** Audit-log sink (`dags/src/db.py:70-99`): single-row upsert into
  * `file_ingestion_log` keyed by `file_key`, and — load-bearing contract —
  * it SWALLOWS its own errors so auditing can never fail the pipeline
  * (`db.py:96`).
  */
object AuditLog {
  import graft.ingest.Schemas.AuditEntry

  /** Pluggable so the router/tests run without Postgres. */
  trait Sink {
    /** Never throws. */
    def log(entry: AuditEntry): Unit
    /** Latest status per file key (the PK upsert semantics). */
    def current: Map[String, AuditEntry]
  }

  val auditUpsertSql: String =
    """INSERT INTO file_ingestion_log
      |  (file_key, bucket, status, rows_processed, error, updated_at)
      |VALUES (?, ?, ?, ?, ?, now())
      |ON CONFLICT (file_key) DO UPDATE
      |  SET status = EXCLUDED.status,
      |      rows_processed = EXCLUDED.rows_processed,
      |      error = EXCLUDED.error,
      |      updated_at = now()""".stripMargin

  /** Driver-side in-memory sink: the audit stream is one row per file per
    * stage — metadata-scale, never data-scale — so a map keyed like the PK
    * is the faithful test double. */
  final class InMemorySink extends Sink {
    private val state = scala.collection.concurrent.TrieMap.empty[String, AuditEntry]
    private val log0 = scala.collection.mutable.ArrayBuffer.empty[AuditEntry]
    override def log(entry: AuditEntry): Unit = synchronized {
      state.put(entry.file_key, entry)
      log0 += entry
    }
    override def current: Map[String, AuditEntry] = state.toMap
    /** Full status history, in arrival order (state-machine assertions). */
    def history: Seq[AuditEntry] = synchronized(log0.toList)
  }

  /** JDBC sink with the swallow-errors contract. */
  final class JdbcSink(url: String, props: Properties) extends Sink {
    override def log(entry: AuditEntry): Unit =
      try {
        val conn = DriverManager.getConnection(url, props)
        try {
          val st = conn.prepareStatement(auditUpsertSql)
          st.setString(1, entry.file_key)
          st.setString(2, entry.bucket)
          st.setString(3, entry.status)
          entry.rows_processed match {
            case Some(n) => st.setLong(4, n)
            case None => st.setNull(4, java.sql.Types.BIGINT)
          }
          entry.error match {
            case Some(e) => st.setString(5, e)
            case None => st.setNull(5, java.sql.Types.VARCHAR)
          }
          st.executeUpdate()
        } finally conn.close()
      } catch {
        // Do not raise: audit logging must never fail the pipeline
        // (db.py:96). Visibility via stderr only.
        case NonFatal(e) =>
          System.err.println(s"[audit] swallow: ${entry.file_key} -> ${e.getMessage}")
      }
    override def current: Map[String, AuditEntry] = Map.empty
  }
}
