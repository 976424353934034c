package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Canary against driver-side testdata regeneration drift: the driver
  * rebuilds /root/testdata between rounds, and physical schemas have
  * ALREADY drifted once (round 11: events.ts TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)/NTZ, which silently broke 11 event queries at
  * bench time while the previous generation's correctness stayed
  * green). This spec fails loudly at `sbt test` time instead, naming
  * the drifted column; `Kpis.eventsTable`'s dual-form dispatch is the
  * pattern for absorbing a new physical form.
  */
class SchemaCanarySpec extends AnyFunSuite {
  import SparkTestSession._

  // allowed logical types per column; a set where history has already
  // shown multiple physical forms
  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> Set(IntegerType),
      "r_name" -> Set(StringType)),
    "nation" -> Map("n_nationkey" -> Set(IntegerType),
      "n_name" -> Set(StringType), "n_regionkey" -> Set(IntegerType)),
    "customer" -> Map("c_custkey" -> Set(LongType),
      "c_name" -> Set(StringType), "c_nationkey" -> Set(IntegerType),
      "c_acctbal" -> Set(DoubleType), "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map("s_suppkey" -> Set(LongType),
      "s_name" -> Set(StringType), "s_nationkey" -> Set(IntegerType),
      "s_acctbal" -> Set(DoubleType)),
    "part" -> Map("p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map("o_orderkey" -> Set(LongType),
      "o_custkey" -> Set(LongType), "o_orderstatus" -> Set(StringType),
      "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> Set(TimestampType, TimestampNTZType),
      "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map("l_orderkey" -> Set(LongType),
      "l_partkey" -> Set(LongType), "l_suppkey" -> Set(LongType),
      "l_linenumber" -> Set(IntegerType), "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType), "l_discount" -> Set(DoubleType),
      "l_tax" -> Set(DoubleType), "l_returnflag" -> Set(StringType),
      "l_linestatus" -> Set(StringType),
      "l_shipdate" -> Set(TimestampType, TimestampNTZType)),
    "events" -> Map("event_id" -> Set(LongType),
      // nanos-long (legacy flag), micros-NTZ, and zoned forms all seen
      // or anticipated; eventsTable normalizes every one
      "ts" -> Set(LongType, TimestampType, TimestampNTZType),
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map("doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Map("vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
      "label" -> Set(IntegerType)))

  test("testdata physical schemas match what the loaders handle") {
    expected.foreach { case (table, cols) =>
      val schema = spark.read.parquet(s"$sfDir/$table.parquet").schema
      cols.foreach { case (name, allowed) =>
        val f = schema.find(_.name == name)
        assert(f.isDefined, s"$table.$name MISSING — testdata regenerated " +
          "with schema drift; update loaders + this canary")
        assert(allowed.contains(f.get.dataType),
          s"$table.$name is ${f.get.dataType}, expected one of $allowed — " +
            "testdata regenerated with a new physical form; extend the " +
            "loader (see Kpis.eventsTable's dual-form dispatch) and this " +
            "canary")
      }
    }
  }
}
