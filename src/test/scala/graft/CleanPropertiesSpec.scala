package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{Clean, Schemas}

/** Property-based invariants for the clean+dedup core (SURVEY §5):
  * arbitrary dirty all-string frames in, contract guarantees out.
  * ScalaCheck generators drive the cases with fixed seeds (deterministic
  * CI) via a small explicit sampler — scalatest's scalacheck bridge is a
  * separate artifact not present in the offline cache. */
class CleanPropertiesSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val cell: Gen[String] = Gen.oneOf(
    Gen.const(null: String),
    Gen.const("nan"),
    Gen.const(""),
    Gen.const("  padded  "),
    Gen.const("not-a-date"),
    Gen.const("2024-03-05 06:07:08"),
    Gen.const("2024-11-30"),
    Gen.choose(-999, 999).map(_.toString),
    Gen.choose(0.0, 99.0).map(d => f"$d%.2f"),
    Gen.alphaNumStr.map(_.take(8)))

  private val keyGen: Gen[String] =
    Gen.oneOf(Gen.const(null: String), Gen.const("nan"),
      Gen.choose(0, 5).map(i => s"k$i"))

  private val rowGen: Gen[(String, String, String, String, String, String)] =
    for {
      id <- keyGen; d <- cell; c <- cell; p <- cell; q <- cell; a <- cell
    } yield (id, d, c, p, q, a)

  private def sample(n: Int, seed: Long): List[(String, String, String, String, String, String)] =
    Gen.listOfN(n, rowGen)
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))

  private def toDf(rows: List[(String, String, String, String, String, String)]) = {
    val data = rows.map(r => Row(r._1, r._2, r._3, r._4, r._5, r._6))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 4), Schemas.allString)
  }

  test("cleanSales output satisfies the warehouse contract on arbitrary dirt") {
    (1L to 8L).foreach { seed =>
      val rows = sample(60, seed)
      val out = Clean.cleanSales(toDf(rows)).collect()
      // schema + column order fixed
      assert(out.forall(_.length == Schemas.required.length))
      // no null / "nan" keys survive; keys unique after dedup
      val keys = out.map(_.getAs[String]("sale_id"))
      assert(keys.forall(k => k != null && k != "nan"), s"seed $seed")
      assert(keys.distinct.length == keys.length, s"seed $seed")
      // coercion defaults hold
      assert(out.forall(r => r.getAs[Integer]("quantity") != null))
      assert(out.forall(r => r.getAs[java.lang.Double]("amount") != null))
      // count = distinct surviving keys in input (dedup keeps exactly one)
      val expectKeys = rows.map(_._1)
        .filter(k => k != null && k.trim != "nan").map(_.trim).distinct.size
      assert(keys.length == expectKeys, s"seed $seed")
    }
  }

  test("dedup keeps the max real date per key; strings trim-idempotent") {
    (1L to 8L).foreach { seed =>
      val rows = sample(50, seed * 31)
      val df = Clean.coerce(Clean.ensureRequired(
        Clean.withIngestOrder(toDf(rows))))
      val kept = Clean.dedupLatest(df)
      val maxes = df.groupBy("sale_id").agg(max("sale_date").as("mx"))
      val bad = kept.join(maxes, "sale_id")
        .filter(
          (col("sale_date").isNull && col("mx").isNotNull) ||
            (col("sale_date").isNotNull && col("sale_date") =!= col("mx")))
        .count()
      assert(bad == 0, s"seed $seed: a kept row lost to a later date")
      val untrimmed = kept.filter(
        col("customer_id") =!= trim(col("customer_id")) ||
          col("product_id") =!= trim(col("product_id"))).count()
      assert(untrimmed == 0, s"seed $seed")
    }
  }

  test("cleaning twice equals cleaning once (idempotence)") {
    (1L to 5L).foreach { seed =>
      val rows = sample(40, seed * 97)
      val once = Clean.cleanSales(toDf(rows))
      val restrung = once.select(once.columns.map { c =>
        if (c == "sale_date")
          date_format(col(c), "yyyy-MM-dd HH:mm:ss").as(c)
        else col(c).cast("string").as(c)
      }: _*)
      val twice = Clean.cleanSales(restrung)
      val a = once.orderBy("sale_id").collect()
      val b = twice.orderBy("sale_id").collect()
      assert(a.sameElements(b), s"seed $seed: clean not idempotent")
    }
  }
}
