package graft

import org.scalatest.funsuite.AnyFunSuite

/** q432 curation v3 — the decontam-first ordering q430 certified, acted
  * on (VERDICT r15 #2). The ledger's certificate rows are the claim:
  * rescued_groups must be POPULATED (clusters whose dirty-blind min-id
  * representative is contaminated but which carry a clean sibling —
  * the exact set dedup-first erases), and residual_contam must be a
  * measured ZERO on the final corpus (the q392 residual-assertion
  * discipline applied end-to-end). */
class CurationV3Spec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val ledger =
    SparkEntry.queries("q432_curation_v3")(spark, sfDir)
      .collect()
      .map(r => r.getAs[String]("stage") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))))
      .toMap

  test("the rescue population survives: rescued_groups > 0") {
    val (nDocs, nTokens) = ledger("rescued_groups")
    assert(nDocs > 0,
      "no rescued clusters — the decontam-first reorder is vacuous here")
    assert(nTokens > 0, "rescued representatives must carry token mass")
  }

  test("the final corpus is decontaminated: residual_contam = 0") {
    assert(ledger("residual_contam") == ((0L, 0L)))
  }

  test("gate stages only shrink; the rewrite drops tokens but no docs") {
    val order = Seq("ingest", "quality", "perplexity", "loop_gate",
      "contam_gate", "exact_dedup", "cluster_collapse",
      "substring_rewrite")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(ledger(b)._1 <= ledger(a)._1, s"$b grew docs over $a")
      assert(ledger(b)._2 <= ledger(a)._2, s"$b grew tokens over $a")
    }
    // the rewrite is an excision, not a drop: doc count must be exactly
    // the cluster-collapse survivors, token mass strictly below (the
    // excerpt clones guarantee work for the stage at the sf fixtures)
    assert(ledger("substring_rewrite")._1 == ledger("cluster_collapse")._1)
    assert(ledger("substring_rewrite")._2 < ledger("cluster_collapse")._2)
    // the cluster stage has real work too: the near-clone injection
    // guarantees verified components among the survivors
    assert(ledger("cluster_collapse")._1 < ledger("exact_dedup")._1)
  }

  test("pack row is the ceiling of the final token mass over 512") {
    val (tokens7) = ledger("substring_rewrite")._2
    assert(ledger("pack_512") == (((tokens7 + 511) / 512, tokens7)))
  }

  test("decontam-first keeps at least as many docs as dedup-first would") {
    // dedup-first loses every rescued group entirely; v3's final doc
    // count must therefore exceed (cluster_collapse survivors − rescued)
    val rescued = ledger("rescued_groups")._1
    val kept = ledger("cluster_collapse")._1
    assert(kept >= rescued,
      "every rescued group contributes exactly one clean survivor")
  }
}
