package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Binned point-in-interval join: boundary semantics, bin-edge coverage,
  * equivalence with the naive inequality join. */
class RangeJoinSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("half-open boundaries and bin-edge intervals") {
    val points = Seq((1L, 10L, 100L), (1L, 11L, 200L), (1L, 12L, 199L),
      (1L, 13L, 99L)).toDF("k", "id", "t")
    // interval [100, 200) — bin width 50 puts start/end on bin edges
    val iv = Seq((1L, 100L, 200L, "w1")).toDF("k", "s", "e", "tag")
    val out = RangeJoin.pointInInterval(points, iv, "k", "t", "s", "e", binUs = 50L)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(10L, 12L)) // 100 in, 200 out (exclusive), 199 in, 99 out
  }

  test("caller-owned _bin column survives; negative epochs still match") {
    val points = Seq((1L, 10L, -150L, "keep"), (1L, 11L, 150L, "keep2"))
      .toDF("k", "id", "t", "_bin") // working name already taken
    val iv = Seq((1L, -200L, -100L, "neg"), (1L, 100L, 200L, "pos"))
      .toDF("k", "s", "e", "tag")
    val out = RangeJoin.pointInInterval(points, iv, "k", "t", "s", "e",
        binUs = 50L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("tag"),
        r.getAs[String]("_bin"))).sortBy(_._1)
    // pre-1970 point matched despite cast-long truncation (monotone);
    // the caller's _bin data is intact on the output
    assert(out.toSeq == Seq((10L, "neg", "keep"), (11L, "pos", "keep2")))
  }

  test("malformed (end <= start) intervals are dropped, not exploded") {
    val points = Seq((1L, 10L, 150L)).toDF("k", "id", "t")
    val iv = Seq((1L, 200L, 100L, "backwards"), (1L, 150L, 150L, "empty"),
      (1L, 100L, 200L, "ok")).toDF("k", "s", "e", "tag")
    val out = RangeJoin.pointInInterval(points, iv, "k", "t", "s", "e", binUs = 50L)
      .select("tag").collect().map(_.getString(0))
    assert(out.toSeq == Seq("ok"))
  }

  test("binned join equals the naive inequality join on random data") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(i =>
      (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(10000).toLong))
      .toDF("k", "id", "t")
    val iv = (1 to 40).map { i =>
      val s = rnd.nextInt(9000).toLong
      (rnd.nextInt(4).toLong, s, s + 1 + rnd.nextInt(800), s"iv$i")
    }.toDF("k", "s", "e", "tag")
    val binned = RangeJoin.pointInInterval(points, iv, "k", "t", "s", "e", binUs = 256L)
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = points.join(iv, Seq("k"))
      .filter($"s" <= $"t" && $"t" < $"e")
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(binned == naive)
  }
}
