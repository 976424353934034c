package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-12g queries (q249–q255). */
class Round12fSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q249: ten parts, stock levels inside the quantity domain") {
    val rows = queries.StatsQueries.q249Newsvendor(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val q = r.getAs[Double]("q90_qty")
      assert(q >= 1 && q <= 50)
    }
  }

  test("q250: knn values lie within the observed degree range") {
    val rows = queries.GraphQueries.q250NeighborDegree(spark, sfDir)
      .collect()
    val degs = rows.map(_.getAs[Long]("degree"))
    val (lo, hi) = (degs.min.toDouble, degs.max.toDouble)
    rows.foreach { r =>
      val knn = r.getAs[Double]("knn")
      assert(knn >= lo - 1e-9 && knn <= hi + 1e-9)
    }
  }

  test("q251: disagreement rates are rates") {
    queries.DocQueries.q251CodeSwitch(spark, sfDir).collect().foreach { r =>
      val d = r.getAs[Double]("disagree_rate")
      assert(d >= 0 && d <= 1)
      assert(r.getAs[Long]("n_disagree") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q252: the bridge closes (gap within quantization tolerance)") {
    val rows = queries.MarketQueries.q252RevenueBridge(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("bridge_gap")) < 1.0,
        s"month ${r.getAs[Long]("month_index")} gap ${r.getAs[Double]("bridge_gap")}")
    }
  }

  test("q253: c-chart limits bracket the center") {
    queries.SeriesQueries.q253CChart(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Double]("lcl") <= r.getAs[Double]("c_bar"))
      assert(r.getAs[Double]("c_bar") <= r.getAs[Double]("ucl"))
    }
  }

  test("q254: intrinsic dimension positive and below the ambient 64") {
    val r = queries.EmbedQueries.q254IntrinsicDim(spark, sfDir)
      .collect().head
    val id = r.getAs[Double]("intrinsic_dim")
    assert(r.getAs[Long]("n_vectors") > 0)
    assert(id > 0 && id < 64, s"intrinsic dim $id")
  }

  test("q255: migration shares partition the both-active population") {
    val rows = queries.MarketQueries.q255SegmentMigration(spark, sfDir)
      .collect()
    assert(rows.length <= 25)
    val s = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(s - 1.0) < 1e-3, s"shares sum to $s")
    rows.foreach { r =>
      assert(r.getAs[Int]("seg_from") >= 1 && r.getAs[Int]("seg_from") <= 5)
      assert(r.getAs[Int]("seg_to") >= 1 && r.getAs[Int]("seg_to") <= 5)
    }
  }
}
