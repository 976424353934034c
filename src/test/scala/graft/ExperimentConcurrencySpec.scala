package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{ExperimentQueries, Kpis, SeriesQueries, SessionQueries}

/** q129 A/B z-test, q130 revenue ACF, q131 peak concurrency: independent
  * in-memory references and invariants beyond the DuckDB oracle hash.
  */
class ExperimentConcurrencySpec extends AnyFunSuite {
  import SparkTestSession._

  test("q129: arms partition users, sums partition purchases, z matches " +
    "a BigInt-exact scala reference") {
    val row = ExperimentQueries.q129AbTest(spark, sfDir).collect().head
    val users = Kpis.eventsTable(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", lit(1L))
        .otherwise(lit(0L))).as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nUsers = users.length.toLong
    val totalPurchases = users.map(_._2).sum
    assert(row.getAs[Long]("n_a") + row.getAs[Long]("n_b") == nUsers)
    assert(row.getAs[Long]("s_a") + row.getAs[Long]("s_b") == totalPurchases)

    // independent reference: same md5 split computed in the JVM
    def isA(uid: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(uid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex.charAt(0) < '8'
    }
    val (a, b) = users.partition(u => isA(u._1))
    assert(row.getAs[Long]("n_a") == a.length.toLong)
    assert(row.getAs[Long]("n_b") == b.length.toLong)
    def stats(xs: Array[Long]): (Double, Double) = {
      val n = xs.length.toDouble
      val s = xs.sum.toDouble
      val ss = xs.map(x => x * x).sum.toDouble
      (s / n, (ss - (s * s) / n) / (n - 1.0))
    }
    val (ma, va) = stats(a.map(_._2))
    val (mb, vb) = stats(b.map(_._2))
    val z = (ma - mb) / math.sqrt(va / a.length + vb / b.length)
    assert(math.abs(row.getAs[Double]("mean_a") - ma) < 1e-12)
    assert(math.abs(row.getAs[Double]("mean_b") - mb) < 1e-12)
    assert(math.abs(row.getAs[Double]("z_score") - z) < 1e-9,
      s"z: spark=${row.getAs[Double]("z_score")} ref=$z")
  }

  test("q130: 7 lags, |acf| <= 1, n_pairs = days - lag, lag-1 matches a " +
    "BigDecimal-exact scala reference") {
    val rows = SeriesQueries.q130AutocorrRevenue(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (1L to 7L))
    val nDays = Kpis.table(spark, sfDir, "lineitem")
      .select(to_date(col("l_shipdate"))).distinct().count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == nDays - r.getAs[Long]("lag"))
      assert(math.abs(r.getAs[Double]("acf")) <= 1.0 + 1e-12)
    }
    // lag-1 reference from the exact daily series
    val daily = Kpis.table(spark, sfDir, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("d"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).cast("decimal(18,4)").as("rev"))
      .orderBy("d").collect()
      .map(r => BigDecimal(r.getDecimal(1)))
    val xs = daily.dropRight(1)
    val ys = daily.drop(1)
    val n = BigDecimal(xs.length)
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    val acf1 = ((n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble)))
    // note the spark side pairs (x=row, y=lagged) — correlation is
    // symmetric so the reference orientation does not matter
    assert(math.abs(rows.head.getAs[Double]("acf") - acf1) < 1e-9,
      s"acf(1): spark=${rows.head.getAs[Double]("acf")} ref=$acf1")
  }

  test("q131: peak/at/count match an in-memory sweep-line over the same " +
    "session bounds") {
    val row = SessionQueries.q131PeakConcurrency(spark, sfDir).collect().head
    // rebuild session intervals in memory from raw events
    val evs = Kpis.eventsTable(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gapUs = SessionQueries.GapMinutes * 60L * 1000000L
    val sessions = evs.groupBy(_._1).values.flatMap { g =>
      val ts = g.sortBy(e => (e._2, e._3)).map(_._2)
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = ts.head; var prev = ts.head
      ts.tail.foreach { t =>
        if (t - prev > gapUs) { bounds += ((start, prev)); start = t }
        prev = t
      }
      bounds += ((start, prev))
      bounds
    }.toArray
    assert(row.getAs[Long]("n_sessions") == sessions.length.toLong)
    val sweep = (sessions.map(s => (s._1, 1L)) ++
      sessions.map(s => (s._2 + 1L, -1L))).sortBy(identity)
    var cur = 0L; var peak = 0L; var at = Long.MaxValue
    sweep.foreach { case (t, d) =>
      cur += d
      if (cur > peak) { peak = cur; at = t }
    }
    assert(row.getAs[Long]("peak_concurrent") == peak)
    assert(row.getAs[Long]("at_us") == at)
    assert(peak >= 1 && peak <= sessions.length)
  }
}
