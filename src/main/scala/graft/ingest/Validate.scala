package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.control.NonFatal

/** Per-format schema-compliance validators returning a `(valid, error)`
  * verdict (reference `dags/src/validator.py:37-99`).
  *
  * Sample bounds mirror the reference exactly: CSV checks a ≤1000-row sample
  * and date-probes the first 50 values (`validator.py:42,56`); JSON checks
  * the first 100 records (`validator.py:72`); parquet is a metadata-only
  * schema inspection (`validator.py:85-99` reads data, but the column-set
  * check needs only the footer — a deliberate upgrade: zero data scanned).
  *
  * Scale posture: validation cost is O(sample) per file regardless of file
  * size — bounded `.limit(n)` reads that never scan a 100 TB prefix.
  */
object Validate {
  import Schemas.requiredSet

  final case class ValidationResult(key: String, valid: Boolean, error: String)

  private def missingMsg(cols: Set[String]): Option[String] = {
    val missing = requiredSet -- cols
    if (missing.nonEmpty)
      Some(s"Missing required columns: ${missing.toSeq.sorted.mkString("[", ", ", "]")}")
    else None
  }

  /** CSV: required ⊆ lowered header set over a ≤1000-row sample, then the
    * first 50 `sale_date` values must all parse (`validator.py:37-61`; a
    * non-null unparseable value fails the file, like `errors="raise"`). */
  def validateCsv(spark: SparkSession, path: String): (Boolean, String) =
    try {
      val df = Readers.readCsv(spark, path).limit(1000)
      missingMsg(df.columns.toSet) match {
        case Some(m) => (false, m)
        case None =>
          val bad = df.select(col("sale_date")).limit(50)
            .filter(col("sale_date").isNotNull &&
              expr("try_to_timestamp(sale_date)").isNull)
            .take(1)
          if (bad.nonEmpty)
            (false, s"sale_date parse issue: unparseable value '${bad.head.getString(0)}'")
          else (true, "")
      }
    } catch {
      case NonFatal(e) => (false, s"CSV parse error: ${e.getMessage}")
    }

  /** JSON (array or NDJSON): every record in a ≤100-record sample must carry
    * all required keys (`validator.py:64-82` checks record-by-record, so one
    * key-less record among 100 fails the file even if other records have the
    * key). NDJSON: first 100 text lines, `json_object_keys` per line; array
    * form: schema-union check.
    *
    * Intended-semantics divergence (same policy as the routing bug, SURVEY
    * §3.1): the reference's `validate_json` line-parses array files too, so
    * it rejects EVERY array-form file (`json.loads` on a bracket line
    * throws) even though its own reader supports arrays
    * (`processor.py:27-29`). We validate arrays properly. */
  def validateJson(spark: SparkSession, path: String): (Boolean, String) =
    try {
      val isArray = Detect.firstNonWsChar(
        path, spark.sparkContext.hadoopConfiguration).contains('[')
      if (isArray) {
        missingMsg(Readers.readJson(spark, path).columns.toSet) match {
          case Some(m) => (false, m)
          case None => (true, "")
        }
      } else {
        val bad = spark.read.text(path)
          .filter(length(trim(col("value"))) > 0)
          .limit(100)
          .select(expr("transform(json_object_keys(value), k -> lower(k))")
            .as("keys"))
          .filter(col("keys").isNull || // unparseable line
            requiredSet.toSeq.sorted.map(k =>
              !array_contains(col("keys"), k)).reduce(_ || _))
          .take(1)
        if (bad.nonEmpty) {
          val keys = Option(bad.head.getSeq[String](0)).map(_.toSet)
          keys match {
            case None => (false, "JSON parse error: unparseable record")
            case Some(ks) =>
              (false, s"Missing columns: ${(requiredSet -- ks).toSeq.sorted.mkString("[", ", ", "]")}")
          }
        } else (true, "")
      }
    } catch {
      case NonFatal(e) => (false, s"JSON parse error: ${e.getMessage}")
    }

  /** Parquet: lowered column set ⊇ required — footer metadata only, no data
    * scan (`validator.py:85-99`). */
  def validateParquet(spark: SparkSession, path: String): (Boolean, String) =
    try {
      val cols = spark.read.parquet(path).schema
        .fieldNames.map(_.trim.toLowerCase).toSet
      missingMsg(cols) match {
        case Some(m) => (false, m)
        case None => (true, "")
      }
    } catch {
      case NonFatal(e) => (false, s"Parquet parse error: ${e.getMessage}")
    }

  /** Dispatch on detected format (`process_sales_dags.py:124-136`). */
  def validate(spark: SparkSession, path: String): ValidationResult =
    try {
      val (valid, err) =
        Detect.forPath(path, spark.sparkContext.hadoopConfiguration) match {
          case Detect.Csv => validateCsv(spark, path)
          case Detect.Json => validateJson(spark, path)
          case Detect.Parquet => validateParquet(spark, path)
          case other => (false, s"Unknown format: $other")
        }
      ValidationResult(path, valid, err)
    } catch {
      case NonFatal(e) => ValidationResult(path, valid = false, e.getMessage)
    }
}
