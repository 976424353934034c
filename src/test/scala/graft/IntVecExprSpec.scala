package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.functions.VectorFunctions
import graft.queries.{RetrievalQueries, SeriesQueries, ShardQueries}

/** Bit-equality specs for the round-17 native integer expressions
  * (DotProductL, FeatureHashVecL, FfdPackL, DtwCentsL) and the unrolled
  * Morton z-value against their retained HOF spellings — the same
  * native-vs-spec discipline as DotProductD/SimHash64 (DocOpsSpec). Every
  * replaced call site computes EXACT integer arithmetic, so "equal" here
  * means literally identical values, not approximately. */
class IntVecExprSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  private def tokHashes = TextFunctions.tokenHashes(
    TextFunctions.tokens(lower(col("text"))))

  test("dot_product_l is bit-identical to the HOF fold on fixture vectors") {
    val d = 32
    val ch = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(VectorFunctions.featureHashVec(tokHashes, d).as("v"))
      .limit(200)
    val pairs = ch.crossJoin(ch.select(col("v").as("w")))
      .select(
        VectorFunctions.dotL(col("v"), col("w")).as("native"),
        VectorFunctions.dotLHof(col("v"), col("w")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
    assert(pairs.filter(col("native").isNull).count() == 0)
  }

  test("dot_product_l NULLs on mismatched length and NULL elements, like the HOF") {
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)))
      .toDF("a", "b")
      .select(
        VectorFunctions.dotL(col("a"), col("b")).as("native"),
        VectorFunctions.dotLHof(col("a"), col("b")).as("hof"))
    df.collect().foreach { r =>
      assert(r.isNullAt(0), "native must be NULL")
      assert(r.isNullAt(1), "HOF spec is NULL")
    }
  }

  test("feature_hash_vec_l is bit-identical to the HOF histogram fold") {
    val d = 32
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(tokHashes.as("hs"))
      .select(
        VectorFunctions.featureHashVec(col("hs"), d).as("native"),
        VectorFunctions.featureHashVecHof(col("hs"), d).as("hof"))
    assert(docs.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("retrieval chunkVec: native equals the retained HOF spec on real chunks") {
    // end-to-end at the call-site granularity: token slices from the
    // documents table, both spellings of the chunk vector
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(length(trim(col("text"))) > 0)
      .select(TextFunctions.tokens(lower(col("text"))).as("toks"))
      .select(slice(col("toks"), 1, 24).as("ctoks"))
    val both = toks.select(
      RetrievalQueries.chunkVecNative(col("ctoks")).as("native"),
      RetrievalQueries.chunkVecHof(col("ctoks")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("ffd_pack_l is bit-identical to the relational FFD fold") {
    // descending sizes with ties, exact-fit and overflow cases, plus the
    // single-element and uniform degenerate censuses
    val cases = Seq(
      (Seq(9L, 7L, 6L, 5L, 4L, 3L, 2L, 2L, 1L), 10L),
      (Seq(8L, 8L, 8L, 8L), 8L),
      (Seq(5L), 20L),
      (Seq(4L, 4L, 4L, 4L, 4L, 4L), 12L))
    val df = cases.toDF("sizes", "cap")
      .select(
        org.apache.spark.sql.graft.ColumnShim.column(
          org.apache.spark.sql.graft.FfdPackL(
            org.apache.spark.sql.graft.ColumnShim.expression(col("sizes")),
            org.apache.spark.sql.graft.ColumnShim.expression(col("cap"))))
          .as("native"),
        ShardQueries.ffdBinsHof.as("hof"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"FFD mismatch: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
    // and on the real q359 census shape: descending order-day sizes
    val files = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(col("o_orderdate")).agg(count(lit(1)).as("c"))
    val census = files.agg(
        sort_array(collect_list(struct((-col("c")).as("nc"),
          col("o_orderdate").as("day")))).as("sf"),
        (max(col("c")) * lit(4L)).as("cap"))
      .select(transform(col("sf"), s => (-s.getField("nc")).cast("long"))
        .as("sizes"), col("cap"))
    val both = census.select(
      org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.graft.FfdPackL(
          org.apache.spark.sql.graft.ColumnShim.expression(col("sizes")),
          org.apache.spark.sql.graft.ColumnShim.expression(col("cap"))))
        .as("native"),
      ShardQueries.ffdBinsHof.as("hof")).head()
    assert(both.getSeq[Long](0) == both.getSeq[Long](1))
  }

  test("dtw_cents_l is bit-identical to the relational DTW fold") {
    // hand cases incl. length-1 series on either side
    val cases = Seq(
      (Seq(1L, 3L, 5L), Seq(2L, 4L)),
      (Seq(10L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L, 3L), Seq(7L)),
      (Seq(5L, 5L, 5L), Seq(5L, 5L, 5L)),
      (Seq(0L, 100L, 0L, 100L), Seq(100L, 0L, 100L, 0L)))
    val df = cases.toDF("va", "vb")
      .select(
        org.apache.spark.sql.graft.ColumnShim.column(
          org.apache.spark.sql.graft.DtwCentsL(
            org.apache.spark.sql.graft.ColumnShim.expression(col("va")),
            org.apache.spark.sql.graft.ColumnShim.expression(col("vb"))))
          .as("native"),
        SeriesQueries.dtwCentsHof.as("hof"))
    df.collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // and on the real q354 census: every nation pair's monthly vectors
    val vecs = SeriesQueries.nationMonthlyCentsVecs(spark, sfDir)
    val pairs = vecs.select(col("nation").as("na"), col("v").as("va"))
      .crossJoin(vecs.select(col("nation").as("nb"), col("v").as("vb")))
      .filter(col("na") < col("nb"))
      .select(
        org.apache.spark.sql.graft.ColumnShim.column(
          org.apache.spark.sql.graft.DtwCentsL(
            org.apache.spark.sql.graft.ColumnShim.expression(col("va")),
            org.apache.spark.sql.graft.ColumnShim.expression(col("vb"))))
          .as("native"),
        SeriesQueries.dtwCentsHof.as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
    assert(pairs.count() > 0)
  }

  test("unrolled Morton z-value equals the HOF fold on the fact domain") {
    val epoch = lit(java.sql.Date.valueOf("1992-01-01"))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(datediff(col("l_shipdate"), epoch).as("d"),
        col("l_partkey").cast("int").as("p"))
    val both = li.select(
      ShardQueries.mortonZ16(col("d"), col("p")).as("native"),
      ShardQueries.mortonZ16Hof.as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("sortable_double_bits is order-isomorphic and exactly invertible") {
    val vals = Seq(-3.5, -1.0, -0.25, -1e-300, 0.0, 1e-300, 0.3,
      0.9999999, 1.0, 7.25)
    val df = vals.toDF("d").select(col("d"),
      org.apache.spark.sql.graft.ColumnShim.column(
        org.apache.spark.sql.graft.SortableDoubleBits(
          org.apache.spark.sql.graft.ColumnShim.expression(col("d"))))
        .as("bits"))
      .select(col("d"), col("bits"),
        org.apache.spark.sql.graft.ColumnShim.column(
          org.apache.spark.sql.graft.SortableBitsToDouble(
            org.apache.spark.sql.graft.ColumnShim.expression(col("bits"))))
          .as("back"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        s"round-trip drift at ${r.getDouble(0)}")
    }
    val byVal = rows.sortBy(_.getDouble(0)).map(_.getLong(1)).toSeq
    assert(byVal == byVal.sorted, "bits must order exactly like the doubles")
  }

  test("bounded top-3 by sortable cosine equals the row_number window") {
    // the generic law behind the r17 retrieval rewires: TopKLongPairs on
    // (sortable cos bits, doc*2^20+chunk) reproduces the
    // (cos DESC, doc, chunk) window top-3 row-for-row, ties included
    val rows = Seq(
      (1L, 10L, 0, 0.5), (1L, 11L, 1, 0.5), (1L, 9L, 2, 0.5),
      (1L, 12L, 0, -0.25), (1L, 8L, 5, 0.9),
      (2L, 3L, 1, 0.0), (2L, 3L, 0, 0.0))
      .toDF("query_id", "doc_id", "chunk_id", "cos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("doc_id"), col("chunk_id"))
    val win = rows.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("query_id", "rank", "doc_id", "chunk_id", "cos")
    val agg = rows.groupBy(col("query_id"))
      .agg(graft.operators.TopK.topKLongPairs(
        org.apache.spark.sql.graft.ColumnShim.column(
          org.apache.spark.sql.graft.SortableDoubleBits(
            org.apache.spark.sql.graft.ColumnShim.expression(col("cos")))),
        col("doc_id") * lit(1048576L) + col("chunk_id").cast("long"),
        3).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("query_id"), (col("i") + 1).as("rank"),
        shiftright(col("e.id"), 20).as("doc_id"),
        col("e.id").bitwiseAND(lit(1048575L)).cast("int").as("chunk_id"),
        org.apache.spark.sql.graft.ColumnShim.column(
          org.apache.spark.sql.graft.SortableBitsToDouble(
            org.apache.spark.sql.graft.ColumnShim.expression(col("e.key"))))
          .as("cos"))
    assert(win.exceptAll(agg).count() == 0 && agg.exceptAll(win).count() == 0)
  }

  test("new natives are registered for SQL via GraftExtensions") {
    assert(spark.sql("SELECT dot_product_l(array(1L, 2L), array(3L, 4L))")
      .head().getLong(0) == 11L)
    assert(spark.sql("SELECT feature_hash_vec_l(array(0L), 32)")
      .head().getSeq[Long](0).head == 1L)
    assert(spark.sql("SELECT ffd_pack_l(array(3L, 2L), 5L)")
      .head().getSeq[Long](0) == Seq(5L))
    assert(spark.sql("SELECT dtw_cents_l(array(1L, 2L), array(1L, 2L))")
      .head().getLong(0) == 0L)
  }
}
