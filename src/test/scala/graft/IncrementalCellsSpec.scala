package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalCells

/** q339's contract is frozen-cell append semantics (VERDICT r13 #4,
  * mirroring IncrementalIvfSpec): batch-2 vectors must find their
  * batch-1 near-dups THROUGH the frozen cell partition — and, by
  * design, MISS near-dups that sit across a cell boundary (the recall
  * trade every cell-partitioned dedup makes; q101's multi-probe is the
  * documented mitigation). The oracle hash certifies arithmetic parity
  * on the real corpus; this spec certifies both sides of the trade on
  * an adversarial fixture where the in-cell hit and the cross-cell
  * miss are constructed, not incidental.
  *
  * Fixture geometry (dim 64): batch 1 (vec_id % 5 != 0) is two tight
  * clusters with deliberately different NORMS — A = {1,2,3} at 10·e1,
  * B = {6,7,8} at 1·e2 — so Lloyd's (first-k init, 2 rounds) freezes
  * exactly two surviving centroids, cell 1 → 10·e1 and cell 6 → e2.
  * Batch 2 (vec_id % 5 == 0):
  *   - 10 → 10.2·e1: nearest frozen centroid is A's; cos = 1.0 to all
  *     three A members → the IN-CELL hit the append must find;
  *   - 5 → 1·e1: cos = 1.0 to every A member (a true near-dup), but
  *     EUCLIDEAN-nearest centroid is B's (d² = 2 vs 81) — assigned to
  *     cell 6 where every member is orthogonal → the CROSS-CELL miss;
  *   - 15 → 5·e3: orthogonal to everything — a clean admit.
  */
class IncrementalCellsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Dim = 64

  private def unit(axis: Int, scale: Float): Array[Float] = {
    val a = Array.fill(Dim)(0.0f); a(axis) = scale; a
  }

  private lazy val rows = {
    val dir = Files.createTempDirectory("graft-inccells")
    import spark.implicits._
    val emb = Seq(
      // batch 1: cluster A (10·e1) and cluster B (1·e2)
      (1L, unit(0, 10.0f)), (2L, unit(0, 10.0f)), (3L, unit(0, 10.0f)),
      (6L, unit(1, 1.0f)), (7L, unit(1, 1.0f)), (8L, unit(1, 1.0f)),
      // batch 2: in-cell dup, cross-cell near-dup, clean admit
      (10L, unit(0, 10.2f)), (5L, unit(0, 1.0f)), (15L, unit(2, 5.0f)))
      .toDF("vec_id", "embedding")
    emb.write.parquet(s"$dir/embeddings.parquet")
    IncrementalCells.q339CellAppend(spark, dir.toString).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
  }

  test("append covers exactly the batch-2 ids") {
    assert(rows.keySet == Set(5L, 10L, 15L))
  }

  test("in-cell near-dup is found through the frozen cells") {
    val r = rows(10L)
    assert(r.getAs[Long]("cell") == 1L,
      "10.2·e1 must cell-assign to the frozen A centroid (cluster 1)")
    assert(r.getAs[Boolean]("is_dup"))
    assert(r.getAs[Long]("n_b1_dups") == 3L,
      "all three A members share the cell and clear cos >= 0.4")
    assert(r.getAs[Long]("best_b1_match") == 1L,
      "cos ties at 1.0 break to the smallest batch-1 id")
    assert(r.getAs[Double]("best_cos") == 1.0)
  }

  test("cross-cell near-dup is missed BY DESIGN (the frozen-cell recall trade)") {
    val r = rows(5L)
    // Euclidean argmin sends the unit-norm vector to B's cell even
    // though its only cosine neighbors are A's members — the boundary
    // case multi-probe (q101) exists to recover
    assert(r.getAs[Long]("cell") == 6L,
      "1·e1 is Euclidean-nearest the small-norm B centroid")
    assert(!r.getAs[Boolean]("is_dup"),
      "within cell 6 every member is orthogonal: the true A-side " +
        "near-dup is invisible to the single-probe frozen-cell path")
    assert(r.getAs[Long]("n_b1_dups") == 0L)
    assert(r.getAs[Long]("best_b1_match") == -1L)
  }

  test("orthogonal vector admits cleanly") {
    val r = rows(15L)
    assert(!r.getAs[Boolean]("is_dup"))
    assert(r.getAs[Long]("n_b1_dups") == 0L)
    assert(r.getAs[Double]("best_cos") == 0.0)
  }
}
