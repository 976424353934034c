package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Salting
import graft.queries.TermQueries

/** q43 salted aggregation and q44 TF-IDF: result equivalence with the
  * straightforward single-stage formulations, plan shape, and invariants. */
class TermSaltSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("q43: salted two-stage sum equals the plain groupBy") {
    val salted = Salting.queries("q43_salted_sum")(spark, sfDir).collect()
    val plain = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
        .as("sum_qty"), count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
      .collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("q43: plan regroup is two aggregation layers, no extra shuffle of raw rows") {
    val df = Salting.queries("q43_salted_sum")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // stage 1 groups on (key, salt), stage 2 on key — both hash aggregates
    assert(plan.contains("HashAggregate"), s"plan:\n$plan")
    assert("_salt".r.findAllIn(plan).nonEmpty, s"no salt column in plan:\n$plan")
  }

  test("q44: tf-idf output invariants (rank bounds, df consistency, score math)") {
    val out = TermQueries.queries("q44_tfidf_terms")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val langs = out.map(_.getString(0)).distinct
    // top-3 per lang, ranks 1..3, unique per lang
    langs.foreach { l =>
      val ranks = out.filter(_.getString(0) == l).map(_.getInt(5)).sorted
      assert(ranks.head == 1 && ranks.length <= 3 &&
        ranks.toSeq == (1 to ranks.length))
    }
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    out.foreach { r =>
      val (tf, df, score) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(df >= 1 && df <= nDocs)
      assert(tf >= 1)
      val expected = BigDecimal(tf.toDouble * math.log(nDocs.toDouble / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(score - expected) < 1e-9,
        s"score $score vs recomputed $expected (tf=$tf df=$df)")
    }
  }

  test("q44: df(term) counts documents, not occurrences") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "alpha alpha beta"),
      (2L, "en", "alpha gamma"),
      (3L, "fr", "beta beta beta")).toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("tfidf").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TermQueries.queries("q44_tfidf_terms")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // alpha: df=2 (docs 1,2) even though it occurs 3 times; en tf(alpha)=3
    assert(out.contains(("en", "alpha", 3L, 2L)))
    // beta: df=2 (docs 1,3); fr tf(beta)=3
    assert(out.contains(("fr", "beta", 3L, 2L)))
  }
}
