package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DupClusters

/** q417's certification contract: splitting by cluster key leaks ZERO
  * near-dup edges across splits (the structural guarantee — every
  * verified edge lives inside one component, and a component has one
  * split), the doc-level policy measurably leaks on the clone fixture,
  * and both policies partition the same corpus over the same edges. */
class ClusterSplitSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val byPolicy = DupClusters.q417ClusterSplit(spark, sfDir)
    .collect().map(r => r.getAs[String]("policy") -> r).toMap

  test("cluster-aware split leaks nothing; doc-level split does leak") {
    val ca = byPolicy("cluster_aware")
    assert(ca.getAs[Long]("leaked_pairs") == 0L,
      s"a component shares one split key, so no edge can cross: $ca")
    val dl = byPolicy("doc_level")
    assert(dl.getAs[Long]("leaked_pairs") > 0L,
      s"clone siblings hash independently — the fixture must leak: $dl")
  }

  test("both policies partition the same corpus over the same edge set") {
    val Seq(a, b) = byPolicy.values.toSeq
    assert(a.getAs[Long]("n_edges") == b.getAs[Long]("n_edges"))
    def total(r: org.apache.spark.sql.Row): Long =
      r.getAs[Long]("n_train") + r.getAs[Long]("n_val") +
        r.getAs[Long]("n_test")
    assert(total(a) == total(b), s"same corpus: $a vs $b")
    byPolicy.values.foreach { r =>
      val ls = r.getAs[Double]("leak_share")
      assert(ls >= 0.0 && ls < 1.0, r.toString)
    }
  }
}
