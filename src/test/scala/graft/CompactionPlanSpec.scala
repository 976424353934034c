package graft

import java.nio.file.Files
import java.sql.Date

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ShardQueries

/** q359's packing contract on a CONSTRUCTED file census (the oracle
  * hash certifies fold parity on the real tables; this spec certifies
  * the FFD geometry): a census that exactly fills one bin packs to the
  * lower bound, and the fill accounting is exact. */
class CompactionPlanSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("FFD packs a one-full-bin census to the lower bound exactly") {
    val dir = Files.createTempDirectory("graft-ffd")
    // daily file sizes [10,10,10,10,5]; capacity = 4 x 10 = 40:
    // FFD fills bin 1 to exactly 40, leaving the 5 alone in bin 2
    val rows = (1 to 5).flatMap { d =>
      val n = if (d == 5) 5 else 10
      Seq.fill(n)(Date.valueOf(f"1995-01-0$d%d"))
    }
    rows.toDF("o_orderdate").write.parquet(s"$dir/orders.parquet")
    val r = ShardQueries.q359CompactionPlan(spark, dir.toString).head()
    assert(r.getAs[Long]("n_files_before") == 5L)
    assert(r.getAs[Long]("total_rows") == 45L)
    assert(r.getAs[Long]("capacity") == 40L)
    assert(r.getAs[Long]("n_bins_after") == 2L)
    assert(r.getAs[Long]("lb_bins") == 2L, "ceil(45/40) = 2: FFD hits OPT")
    assert(r.getAs[Long]("max_bin_rows") == 40L &&
      r.getAs[Long]("min_bin_rows") == 5L)
    assert(r.getAs[Double]("fill_frac") == 0.5625, "45 / (2 x 40)")
  }

  test("on the real census the plan respects capacity and the lower bound") {
    val r = ShardQueries.q359CompactionPlan(spark,
      SparkTestSession.sfDir).head()
    assert(r.getAs[Long]("max_bin_rows") <= r.getAs[Long]("capacity"))
    assert(r.getAs[Long]("n_bins_after") >= r.getAs[Long]("lb_bins"))
    assert(r.getAs[Long]("n_bins_after") < r.getAs[Long]("n_files_before"),
      "compaction must actually reduce the file count")
  }
}
