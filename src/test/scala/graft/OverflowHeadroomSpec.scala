package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.StatsQueries

/** q423's precision contract: the revenue column (extendedprice) is the
  * one that leaves IEEE-double's exact integer range at the 100 TB
  * horizon — the measured reason for the decimal-sum discipline — while
  * the small-domain columns stay double-exact; every row fits int64 at
  * the horizon and the bit accounting is internally consistent. */
class OverflowHeadroomSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private lazy val byCol = StatsQueries.q423OverflowHeadroom(spark, sfDir)
    .collect().map(r => r.getAs[String]("column_name") -> r).toMap

  test("extendedprice is double-wrong at 100TB; small domains are not") {
    assert(!byCol("l_extendedprice").getAs[Boolean]("exact_in_double_100tb"),
      s"the revenue mass must exceed 2^53 at the target scale: " +
        s"${byCol("l_extendedprice")}")
    Seq("l_discount", "l_tax").foreach { c =>
      assert(byCol(c).getAs[Boolean]("exact_in_double_100tb"),
        s"a [0,0.1] domain cannot threaten 2^53: ${byCol(c)}")
    }
    byCol.values.foreach { r =>
      assert(r.getAs[Boolean]("fits_int64_100tb"), r.toString)
    }
  }

  test("bit accounting: bin length consistent with the projected sum") {
    byCol.values.foreach { r =>
      val s1000 = r.getAs[Long]("sum_cents_1000x")
      assert(s1000 == 1000L * r.getAs[Long]("sum_cents"), r.toString)
      val bits = r.getAs[Long]("bits_1000x")
      assert(bits == 64 - java.lang.Long.numberOfLeadingZeros(s1000),
        s"bin() length must be the binary magnitude: $r")
      assert(r.getAs[Long]("int64_headroom_bits") == 63L - bits)
      assert(r.getAs[Long]("max_cents") <= r.getAs[Long]("sum_cents"))
    }
  }
}
