package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ShardQueries

/** q363's skip-index contract (the oracle hash certifies the
  * arithmetic; this spec certifies the decision the audit exists to
  * inform): a bloom filter never produces a false NEGATIVE (every gate
  * average ≥ the true average), the stacked zone∧bloom gate is at
  * least as selective as either gate alone, and the layout trade is
  * real — the zone map on the part-sorted layout beats the zone map on
  * arrival order, while on arrival order the bloom gate rescues point
  * lookups the zone map has degenerated on. */
class BloomSkipSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = ShardQueries.q363BloomSkip(spark, sfDir)
    .collect().map(r => r.getAs[String]("layout") -> r).toMap

  test("layout inventory, file count, and a non-trivial probe set") {
    assert(rows.keySet == Set("1_by_part", "2_arrival"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_files") == 64L)
      assert(r.getAs[Long]("n_probes") >= 2L,
        "probe rule must yield several interior keys even at sf0.001")
    }
  }

  test("no false negatives: every gate scans at least the true files") {
    rows.values.foreach { r =>
      val t = r.getAs[Double]("avg_files_true")
      assert(r.getAs[Double]("avg_files_zone") >= t, r.toString)
      assert(r.getAs[Double]("avg_files_bloom") >= t, r.toString)
      assert(r.getAs[Double]("avg_files_both") >= t, r.toString)
    }
  }

  test("the stacked gate is at least as selective as either alone") {
    rows.values.foreach { r =>
      val both = r.getAs[Double]("avg_files_both")
      assert(both <= r.getAs[Double]("avg_files_zone"), r.toString)
      assert(both <= r.getAs[Double]("avg_files_bloom"), r.toString)
    }
  }

  test("zone maps win on the sort key and degenerate on arrival order") {
    val sorted = rows("1_by_part"); val arrival = rows("2_arrival")
    assert(sorted.getAs[Double]("avg_files_zone") <
      arrival.getAs[Double]("avg_files_zone"),
      "a part-key point lookup must skip more files when files are" +
        " sorted by part key")
    assert(arrival.getAs[Double]("avg_files_bloom") <
      arrival.getAs[Double]("avg_files_zone"),
      "on arrival order the bloom gate must beat the degenerate zone map")
  }
}
