package graft

import java.sql.DriverManager
import java.util.Properties

import org.scalatest.funsuite.AnyFunSuite

import graft.sink.Upsert

/** Integration test of the foreachPartition JDBC writer against embedded
  * Derby (bundled with Spark): connection-per-partition, batched execution,
  * accumulator row counting, rollback-on-failure. The ON CONFLICT dialect
  * itself is Postgres-only and stays unit-tested at the SQL-text level. */
class UpsertJdbcSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftUpsert;create=true"

  private def withStmt[A](f: java.sql.Statement => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c.createStatement()) finally c.close()
  }

  private def count(table: String): Long = withStmt { st =>
    val rs = st.executeQuery(s"SELECT COUNT(*) FROM $table")
    rs.next(); rs.getLong(1)
  }

  test("distributed insert: all partitions land, batches respected, count exact") {
    withStmt(_.execute(
      "CREATE TABLE sales_t (sale_id VARCHAR(32) PRIMARY KEY, amount DOUBLE)"))
    val df = (1 to 2500).map(i => (s"s$i", i * 1.5)).toDF("sale_id", "amount")
      .repartition(3)
    val n = Upsert.upsert(df, url, new Properties(), "sales_t", "sale_id",
      batchSize = 1000,
      sqlOverride = Some("INSERT INTO sales_t (sale_id, amount) VALUES (?, ?)"))
    assert(n == 2500)
    assert(count("sales_t") == 2500)
  }

  test("failed partition rolls back its transaction") {
    withStmt(_.execute(
      "CREATE TABLE sales_r (sale_id VARCHAR(32) PRIMARY KEY, amount DOUBLE)"))
    val ok = Seq(("a", 1.0), ("b", 2.0)).toDF("sale_id", "amount").coalesce(1)
    Upsert.upsert(ok, url, new Properties(), "sales_r", "sale_id",
      sqlOverride = Some("INSERT INTO sales_r (sale_id, amount) VALUES (?, ?)"))
    assert(count("sales_r") == 2)
    // duplicate keys violate the PK mid-batch → the partition's transaction
    // must roll back entirely (no partial rows) and the failure propagate
    val dup = Seq(("c", 3.0), ("a", 9.0)).toDF("sale_id", "amount").coalesce(1)
    intercept[Exception] {
      Upsert.upsert(dup, url, new Properties(), "sales_r", "sale_id",
        sqlOverride = Some("INSERT INTO sales_r (sale_id, amount) VALUES (?, ?)"))
    }
    assert(count("sales_r") == 2) // "c" rolled back with the batch
  }

  test("audit JDBC sink swallows its own errors (db.py:96 contract)") {
    import graft.ingest.Schemas.AuditEntry
    // Postgres ON CONFLICT syntax against Derby → SQL error; unreachable
    // URL → connection error. Neither may propagate.
    val badDialect = new graft.sink.AuditLog.JdbcSink(url, new Properties())
    badDialect.log(AuditEntry("f1", "b", "validated", None, None))
    val unreachable = new graft.sink.AuditLog.JdbcSink(
      "jdbc:derby:memory:noSuchDbNoCreate", new Properties())
    unreachable.log(AuditEntry("f2", "b", "loaded", Some(5L), Some("e")))
    succeed
  }
}
