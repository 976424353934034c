package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ShardQueries

/** q365's planner contract: the run/cardinality identities that make
  * the byte estimates trustworthy — runs bounded by [n_distinct,
  * n_rows], the low-cardinality flag columns RLE-collapse under a
  * re-sort, dict bits actually cover the cardinality, and the winner
  * is the argmin of its own byte columns. */
class EncodingPlanSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = ShardQueries.q365EncodingPlan(spark, sfDir)
    .collect().map(r => r.getAs[String]("column_name") -> r).toMap

  test("all seven audited columns are present") {
    assert(rows.keySet == Set("l_extendedprice", "l_linestatus",
      "l_partkey", "l_quantity", "l_returnflag", "l_shipdate",
      "l_discount"))
  }

  test("run counts sit between cardinality and row count") {
    rows.values.foreach { r =>
      val runs = r.getAs[Long]("runs_arrival")
      assert(runs >= r.getAs[Long]("n_distinct"), r.toString)
      assert(runs <= r.getAs[Long]("n_rows"), r.toString)
    }
  }

  test("dict bits cover the cardinality and only the cardinality") {
    rows.values.foreach { r =>
      val d = r.getAs[Long]("n_distinct")
      val b = r.getAs[Long]("dict_bits")
      if (d > 1) {
        assert((1L << b) >= d, s"2^$b must reach $d: $r")
        assert((1L << (b - 1)) < d, s"$b bits must be minimal for $d: $r")
      } else assert(b == 0L, r.toString)
    }
  }

  test("low-cardinality flags are dict wins; re-sort collapses their RLE") {
    val rf = rows("l_returnflag")
    assert(rf.getAs[Long]("n_distinct") <= 4L)
    assert(rf.getAs[String]("best_encoding") == "dict",
      "a 3-value flag in arrival order must dictionary-encode")
    assert(rf.getAs[Long]("bytes_rle_sorted") <
      rf.getAs[Long]("bytes_rle_arrival"),
      "sorting by the flag must shrink RLE to ~n_distinct runs")
  }

  test("the reported winner is the argmin of its own byte columns") {
    rows.values.foreach { r =>
      val m = Map(
        "plain" -> r.getAs[Long]("bytes_plain"),
        "dict" -> r.getAs[Long]("bytes_dict"),
        "rle" -> r.getAs[Long]("bytes_rle_arrival"))
      assert(m(r.getAs[String]("best_encoding")) == m.values.min, r.toString)
    }
  }
}
