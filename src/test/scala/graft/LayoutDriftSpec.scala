package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ShardQueries

/** q361's maintenance contract (the oracle hash certifies arithmetic;
  * this spec certifies the decision the audit exists to inform):
  * arrival-order appends degrade every probe against the drifted table,
  * the full re-sort recovers, and the re-optimized state reproduces
  * q355's independently-computed z-order row exactly — a free
  * cross-query consistency check on the whole zone-map machinery. */
class LayoutDriftSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val rows = ShardQueries.q361LayoutDrift(spark, sfDir)
    .collect().map(r => r.getAs[String]("layout") -> r).toMap

  test("state inventory and file counts are as constructed") {
    assert(rows.keySet ==
      Set("1_pristine_base", "2_drifted_appends", "3_reoptimized"))
    assert(rows("1_pristine_base").getAs[Long]("n_files") == 48L)
    assert(rows("2_drifted_appends").getAs[Long]("n_files") == 64L)
    assert(rows("3_reoptimized").getAs[Long]("n_files") == 64L)
  }

  test("appends degrade the table; the re-sort recovers") {
    def c(l: String) = rows(l).getAs[Double]("avg_files_combined")
    assert(c("2_drifted_appends") > c("1_pristine_base"),
      "arrival-order appends must cost every probe")
    assert(c("3_reoptimized") < c("2_drifted_appends"),
      "the full re-sort must beat the drifted state")
  }

  test("the re-optimized state reproduces q355's z-order row exactly") {
    val q355 = ShardQueries.q355ZorderSkip(spark, sfDir).collect()
      .find(_.getAs[String]("layout") == "3_zorder").get
    val re = rows("3_reoptimized")
    Seq("avg_files_date_probe", "avg_files_part_probe",
      "avg_files_combined").foreach { c =>
      assert(re.getAs[Double](c) == q355.getAs[Double](c),
        s"$c diverges between q361 state 3 and q355's z-order layout")
    }
  }
}
