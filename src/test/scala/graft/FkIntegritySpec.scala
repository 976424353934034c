package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QualityQueries

/** q378's audit contract: the fixture star schema is orphan-free on
  * every edge (positive control), and a constructed broken edge is
  * counted exactly — orphans, childless parents, and totals. */
class FkIntegritySpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  test("the fixture star schema has zero orphans on all seven edges") {
    val rows = QualityQueries.q378FkIntegrity(spark, sfDir).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphan_rows") == 0L,
        s"fixture edge must be intact: $r")
      assert(r.getAs[Long]("n_child_rows") > 0L)
      assert(r.getAs[Long]("n_parents") > 0L)
    }
  }

  test("a constructed broken edge counts orphans and childless exactly") {
    val child = Seq(1L, 1L, 2L, 5L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val r = QualityQueries.fkEdge("t", child, "fk", parent, "pk")
      .collect().head
    assert(r.getAs[Long]("n_child_rows") == 5L)
    assert(r.getAs[Long]("n_parents") == 4L)
    assert(r.getAs[Long]("n_orphan_rows") == 2L)   // keys 5 and 9
    assert(r.getAs[Long]("n_childless_parents") == 2L) // keys 3 and 4
  }
}
