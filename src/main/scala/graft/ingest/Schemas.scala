package graft.ingest

import org.apache.spark.sql.types._

/** Sales-ingest schema constants (reference `dags/src/validator.py:14`,
  * `sql/create_tables.sql:3-11`).
  *
  * The reference reads every file all-string (`processor.py:23`,
  * `pd.read_csv(dtype=str)`) so type coercion is centralized in one clean
  * step; we mirror that: [[Readers]] produce all-string frames,
  * [[Clean.cleanSales]] owns every cast.
  */
object Schemas {
  /** Canonical required columns, in warehouse order (`validator.py:14`). */
  val required: Seq[String] =
    Seq("sale_id", "sale_date", "customer_id", "product_id", "quantity", "amount")

  val requiredSet: Set[String] = required.toSet

  /** All-string ingest schema (the `dtype=str` read). */
  val allString: StructType =
    StructType(required.map(StructField(_, StringType, nullable = true)))

  /** Post-clean typed schema (warehouse DDL `create_tables.sql:3-11`;
    * amount kept DOUBLE in flight, NUMERIC(12,2) is sink-side). */
  val cleaned: StructType = StructType(Seq(
    StructField("sale_id", StringType, nullable = false),
    StructField("sale_date", TimestampType, nullable = true),
    StructField("customer_id", StringType, nullable = true),
    StructField("product_id", StringType, nullable = true),
    StructField("quantity", IntegerType, nullable = true),
    StructField("amount", DoubleType, nullable = true)))

  /** Typed core row for `Dataset[Sale]` use. */
  final case class Sale(
      sale_id: String,
      sale_date: java.sql.Timestamp,
      customer_id: String,
      product_id: String,
      quantity: Int,
      amount: Double)

  /** Audit-log row (`create_tables.sql:16-24`). */
  final case class AuditEntry(
      file_key: String,
      bucket: String,
      status: String,
      rows_processed: Option[Long],
      error: Option[String])
}
