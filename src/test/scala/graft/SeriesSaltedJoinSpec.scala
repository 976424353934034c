package graft

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Salting
import graft.queries.SeriesQueries

/** Gap-fill/forward-fill (q62) and the salted skew join (q63). */
class SeriesSaltedJoinSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  test("q62 grid is hour-dense per type; fill carries the last observation") {
    val rows = SeriesQueries.q62GapFill(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Boolean]("was_gap")), "fixture has no gaps")
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      val sorted = rs.sortBy(_.getAs[String]("hour"))
      // endpoints of the span are observations by construction
      assert(!sorted.head.getAs[Boolean]("was_gap"), s"$et leading gap")
      assert(!sorted.last.getAs[Boolean]("was_gap"), s"$et trailing gap")
      // dense grid: consecutive rows are exactly one hour apart
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val ha = LocalDateTime.parse(a.getAs[String]("hour"), fmt)
          val hb = LocalDateTime.parse(b.getAs[String]("hour"), fmt)
          assert(ha.plusHours(1) == hb, s"$et grid hole after $ha")
        case _ =>
      }
      // forward fill: gap rows repeat the last observation's value;
      // observation rows are n_events > 0 with a fresh value
      var lastObs = Double.NaN
      sorted.foreach { r =>
        val v = r.getAs[Double]("filled_avg")
        if (r.getAs[Boolean]("was_gap")) {
          assert(r.getAs[Long]("n_events") == 0L)
          assert(v == lastObs, s"$et gap not carried forward")
        } else {
          assert(r.getAs[Long]("n_events") > 0L)
          lastObs = v
        }
      }
    }
  }

  test("saltedJoin equals the plain join under synthetic skew") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        when(col("l_orderkey") % 3 === 0, lit(1L))
          .otherwise(col("l_suppkey")).as("suppkey"),
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey").as("suppkey"), col("s_name"))
    val plain = li.join(sup, "suppkey")
      .groupBy("suppkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedJoin(li, sup, "suppkey",
        struct(col("l_orderkey"), col("l_linenumber")), saltBuckets = 16)
      .groupBy("suppkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    // the hot key's rows really spread over all 16 salt buckets
    val spread = li.filter(col("suppkey") === 1L)
      .select(countDistinct(
        pmod(hash(struct(col("l_orderkey"), col("l_linenumber"))), lit(16))))
      .head().getLong(0)
    assert(spread == 16L)
  }

  test("q65 flags the synthetic hot key with a dominant hot_factor") {
    val rows = Salting.q65SkewProfile(spark, sfDir).collect()
    assert(rows.length == 5)
    val top = rows.head
    assert(top.getAs[Long]("suppkey") == 1L, "hot key must rank first")
    assert(top.getAs[Double]("hot_factor") > 2.0,
      "synthetic skew must exceed 2x the mean key load")
    assert(top.getAs[Double]("share") > rows(1).getAs[Double]("share"))
    rows.foreach { r =>
      assert(r.getAs[Double]("share") > 0.0 &&
        r.getAs[Double]("share") <= 1.0)
    }
  }

  test("q63 is deterministic and covers every matched supplier") {
    val rows = Salting.q63SaltedJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // supplier 1 absorbs the remapped third of the fact table: it must
    // dominate item counts
    val byKey = rows.map(r =>
      r.getAs[Long]("suppkey") -> r.getAs[Long]("n_items")).toMap
    assert(byKey(1L) == byKey.values.max)
    val again = Salting.q63SaltedJoin(spark, sfDir).collect()
    assert(rows.sameElements(again))
  }
}
