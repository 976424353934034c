package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalCells, KMeans}
import graft.queries.Kpis
import graft.streaming.CellStream
import graft.streaming.CellStream.VecIn

/** Streaming semantic-cell admission: seeding the store (batch 1) and
  * replaying the append batch (batch 2) through
  * [[CellStream.admissions]] with q339's frozen centroids reproduces
  * the registered q339 batch output row for row — best_cos doubles
  * included, since the stream replays DotProductD's exact fold and
  * Spark's HALF_UP rounding. A second fixture pins `admitLive`
  * live-store mode: a clean vector joins its cell's state and catches
  * the next near-dup. */
class CellStreamSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  private def unit(axis: Int, scale: Float): Array[Float] = {
    val a = Array.fill(8)(0.0f); a(axis) = scale; a
  }

  test("replayed embedding log reproduces q339's batch admissions row for row") {
    import graft.functions.VectorFunctions.norm2
    // q339's frozen artifacts, derived exactly as the batch does:
    // Lloyd on batch 1 (vec_id % 5 != 0), k = 16, 2 rounds
    val b1 = Kpis.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        norm2(col("embedding")).as("n2"))
      .filter(col("vec_id") % 5 =!= 0)
    val centroids = KMeans.lloydCentroids(b1, 16, 2).collect()
      .map(r => (r.getAs[Long]("cluster"),
        r.getAs[scala.collection.Seq[Double]]("centroid").toArray))
      .toSeq

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[VecIn]
    val q = CellStream.admissions(mem.toDF(), centroids, t = 0.4)
      .writeStream.format("memory").queryName("cell_admissions")
      .outputMode(OutputMode.Append()).start()
    try {
      val all = Kpis.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getAs[Long]("vec_id"),
          r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
      val (lives, seeds) = all.partition(_._1 % 5 == 0)
      mem.addData(seeds.map(s => VecIn("seed", s._1, s._2)).toIndexedSeq: _*)
      q.processAllAvailable()
      assert(spark.table("cell_admissions").count() == 0,
        "seed rows must not emit admissions")
      mem.addData(lives.map(l => VecIn("live", l._1, l._2)).toIndexedSeq: _*)
      q.processAllAvailable()

      val cols = Seq("vec_id", "cell", "n_b1_dups", "best_b1_match",
        "best_cos", "is_dup")
      val got = spark.table("cell_admissions")
        .select(cols.map(col): _*).orderBy("vec_id").collect().toSeq
      val want = IncrementalCells.q339CellAppend(spark, sfDir)
        .select(cols.map(col): _*).orderBy("vec_id").collect().toSeq
      assert(got.size == want.size && got == want,
        s"stream admissions diverge from q339:\n  stream: ${got.take(5)}" +
          s"\n  batch:  ${want.take(5)}")
    } finally q.stop()
  }

  test("admitLive: a clean vector joins its cell and catches the next near-dup") {
    // frozen 2-cell codebook handed directly (the preregistered-artifact
    // discipline): cell 1 around e1, cell 2 around e2
    val codebook = Seq(
      (1L, Array.tabulate(8)(i => if (i == 0) 1.0 else 0.0)),
      (2L, Array.tabulate(8)(i => if (i == 1) 1.0 else 0.0)))
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[VecIn]
    val q = CellStream.admissions(mem.toDF(), codebook, t = 0.4,
        admitLive = true)
      .writeStream.format("memory").queryName("cell_live")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(VecIn("seed", 100L, unit(0, 1.0f)))
      q.processAllAvailable()
      // batch A: a dup of the seed (flagged, NOT admitted) and a clean
      // cell-2 vector (admitted into live state)
      mem.addData(VecIn("live", 5L, unit(0, 2.0f)),
        VecIn("live", 6L, unit(1, 1.0f)))
      q.processAllAvailable()
      // batch B: near-dup of the live-admitted 6 must now flag against it
      mem.addData(VecIn("live", 7L, unit(1, 3.0f)))
      q.processAllAvailable()

      val rows = spark.table("cell_live").collect()
        .map(r => r.getAs[Long]("vec_id") -> r).toMap
      assert(rows(5L).getAs[Boolean]("is_dup") &&
        rows(5L).getAs[Long]("best_b1_match") == 100L)
      assert(!rows(6L).getAs[Boolean]("is_dup") &&
        rows(6L).getAs[Long]("cell") == 2L)
      assert(rows(7L).getAs[Boolean]("is_dup") &&
        rows(7L).getAs[Long]("best_b1_match") == 6L,
        "the admitted live vector must be discoverable in its cell")
      assert(rows(7L).getAs[Double]("best_cos") == 1.0)
    } finally q.stop()
  }
}
