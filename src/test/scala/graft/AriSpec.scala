package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans

/** q368's pair-counting contract: the contingency pair sums obey the
  * set identities ARI is built from, and the reported ARI is exactly
  * the closing chain over its own integer outputs. */
class AriSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val r = KMeans.q368CellLabelAri(spark, sfDir).collect().head

  test("pair-sum identities") {
    val n = r.getAs[Long]("n_vectors")
    val all = n * (n - 1) / 2
    val pj = r.getAs[Long]("pairs_joint")
    val pc = r.getAs[Long]("pairs_cells")
    val pl = r.getAs[Long]("pairs_labels")
    assert(pj <= math.min(pc, pl),
      "joint agreements cannot exceed either marginal's pair count")
    assert(pc <= all && pl <= all)
  }

  test("ari is the closing chain over its own integer outputs") {
    val pj = r.getAs[Long]("pairs_joint").toDouble
    val pc = r.getAs[Long]("pairs_cells").toDouble
    val pl = r.getAs[Long]("pairs_labels").toDouble
    val n = r.getAs[Long]("n_vectors")
    val pa = (n * (n - 1) / 2).toDouble
    val e = pc * pl / pa
    val expected = (pj - e) / ((pc + pl) / 2.0 - e)
    assert(math.abs(r.getAs[Double]("ari") - expected) <= 1e-6,
      s"ari ${r.getAs[Double]("ari")} vs recomputation $expected")
  }

  test("ari is bounded") {
    val ari = r.getAs[Double]("ari")
    assert(ari <= 1.0 + 1e-9 && ari >= -1.0)
  }
}
