package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** q448 (k-anonymity ladder) and q449 (label aggregation), reconciled
  * against plain-Scala replays plus the laws each census must obey:
  * suppression is monotone along BOTH axes of the q448 grid (a theorem —
  * generalization merges classes, so a row suppressed at a coarse level
  * was already suppressed at every finer one), and q449's
  * reliability-weighted vote must dominate the plain majority on the
  * planted annotator mix (error rates 0.1 … 0.5). */
class GovernanceSpec extends AnyFunSuite {
  import SparkTestSession._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  test("q448 equals the class-census replay and obeys both monotonicity laws") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1),
        math.floor(r.getDouble(2) / 1000.0).toLong))
    val levels: Seq[Map[Any, Int]] = Seq(
      cust.groupBy(identity).map { case (k, v) => (k: Any) -> v.length },
      cust.groupBy(c => (c._1, c._2)).map { case (k, v) => (k: Any) -> v.length },
      cust.groupBy(_._2).map { case (k, v) => (k: Any) -> v.length })
    val got = SparkEntry.queries("q448_k_anonymity")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    assert(got.size == 9)
    for (level <- 0 to 2; k <- Seq(2, 5, 10)) {
      val sizes = levels(level).values.toSeq
      val (nc, sc, mn, mx, sup, kept) = got((level, k))
      assert(nc == sizes.length.toLong && mn == sizes.min.toLong &&
        mx == sizes.max.toLong, s"class stats ($level, $k)")
      assert(sc == sizes.count(_ >= k).toLong)
      assert(sup == sizes.filter(_ < k).map(_.toLong).sum)
      assert(sup + kept == cust.length.toLong, "suppressed + kept = rows")
    }
    // monotone in k (more anonymity → more suppression) and in level
    // (coarser QI → a suppressed row's finer class was also < k)
    for (level <- 0 to 2)
      assert(got((level, 2))._5 <= got((level, 5))._5 &&
        got((level, 5))._5 <= got((level, 10))._5, s"k-monotone at $level")
    for (k <- Seq(2, 5, 10))
      assert(got((0, k))._5 >= got((1, k))._5 &&
        got((1, k))._5 >= got((2, k))._5, s"level-monotone at k=$k")
  }

  test("q453 equals the diversity replay and exposure is monotone in l") {
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1),
        math.floor(r.getDouble(2) / 1000.0).toLong))
    val levels: Seq[Seq[(Int, Int)]] = Seq(
      cust.groupBy(c => (c._1, c._2)).values
        .map(v => (v.length, v.map(_._3).distinct.length)).toSeq,
      cust.groupBy(_._2).values
        .map(v => (v.length, v.map(_._3).distinct.length)).toSeq)
    val got = SparkEntry.queries("q453_l_diversity")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got.size == 6)
    for (level <- 1 to 2; l <- Seq(2, 3, 5)) {
      val cls = levels(level - 1)
      val (nc, fc, mn, mx, exp) = got((level, l))
      assert(nc == cls.length.toLong)
      assert(fc == cls.count(_._2 < l).toLong, s"failing ($level, $l)")
      assert(mn == cls.map(_._2).min.toLong && mx == cls.map(_._2).max.toLong)
      assert(exp == cls.filter(_._2 < l).map(_._1.toLong).sum,
        s"exposed rows ($level, $l)")
    }
    for (level <- 1 to 2)
      assert(got((level, 2))._5 <= got((level, 3))._5 &&
        got((level, 3))._5 <= got((level, 5))._5, s"l-monotone at $level")
  }

  test("q449 equals the vote replay, and reweighting dominates the majority") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val langs = docs.map(_._2).distinct.sorted
    def vote(m: Int, id: Long, lang: String): String = {
      val errs = h60(s"ann $m:$id") % 20 < 2 * (m + 1)
      if (!errs) lang
      else {
        val others = langs.filter(_ != lang)
        others((h60(s"pick $m:$id") % others.length).toInt)
      }
    }
    val votes = docs.flatMap { case (id, lang) =>
      (0 until 5).map(m => (id, lang, m, vote(m, id, lang))) }
    def argmax(byLabel: Map[String, Long]): String =
      byLabel.toSeq.maxBy { case (l, n) => (n, ReverseLex(l)) }._1
    val majority = votes.groupBy(_._1).map { case (id, vs) =>
      val c = vs.groupBy(_._4).map { case (l, g) => l -> g.length.toLong }
      id -> ((argmax(c), c(argmax(c))))
    }
    val weights = (0 until 5).map { m =>
      m -> votes.filter(_._3 == m)
        .count(v => v._4 == majority(v._1)._1).toLong
    }.toMap
    val weighted = votes.groupBy(_._1).map { case (id, vs) =>
      id -> argmax(vs.groupBy(_._4)
        .map { case (l, g) => l -> g.map(v => weights(v._3)).sum })
    }
    val got = SparkEntry.queries("q449_label_aggregation")(spark, sfDir)
      .collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val id = r.getLong(0)
      val (ml, mv) = majority(id)
      assert(r.getString(2) == ml && r.getLong(3) == mv, s"majority $id")
      assert(r.getString(5) == weighted(id), s"weighted $id")
      assert(r.getBoolean(4) == (ml == r.getString(1)))
      assert(r.getBoolean(6) == (weighted(id) == r.getString(1)))
    }
    // the planted dominance: reliability weighting must strictly improve
    // accuracy on this annotator mix (0.1 … 0.5 error rates)
    val mAcc = got.count(_.getBoolean(4))
    val wAcc = got.count(_.getBoolean(6))
    assert(wAcc > mAcc, s"weighted $wAcc must beat majority $mAcc")
    // low-error annotators must earn higher weights than high-error ones
    assert(weights(0) > weights(4),
      "the 10%-error annotator must out-weigh the 50%-error one")
  }

  test("q456 equals the Dawid-Skene E-step replay and never loses to the majority") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val langs = docs.map(_._2).distinct.sorted
    def vote(m: Int, id: Long, lang: String): String = {
      val errs = h60(s"ann $m:$id") % 20 < 2 * (m + 1)
      if (!errs) lang
      else {
        val others = langs.filter(_ != lang)
        others((h60(s"pick $m:$id") % others.length).toInt)
      }
    }
    val votes = docs.flatMap { case (id, lang) =>
      (0 until 5).map(m => (id, m, vote(m, id, lang))) }
    val majority = votes.groupBy(_._1).map { case (id, vs) =>
      id -> vs.groupBy(_._3).map { case (l, g) => l -> g.length }
        .toSeq.maxBy { case (l, n) => (n, ReverseLex(l)) }._1
    }
    val cells = votes.groupBy(v => (v._2, majority(v._1), v._3))
      .map { case (k, g) => k -> g.length.toLong }
    val rowTot = cells.groupBy { case ((m, mt, _), _) => (m, mt) }
      .map { case (k, g) => k -> g.values.sum }
    val expected = votes.groupBy(_._1).map { case (id, vs) =>
      val scored = langs.map { t =>
        val rs = vs.sortBy(_._2).map { case (_, m, v) =>
          (cells.getOrElse((m, t, v), 0L) + 1L).toDouble /
            (rowTot.getOrElse((m, t), 0L) + langs.length).toDouble
        }
        // the FIXED left-associated annotator-order product
        (t, rs.foldLeft(1.0)(_ * _))
      }
      id -> scored.maxBy { case (t, s) => (s, ReverseLex(t)) }._1
    }
    val got = SparkEntry.queries("q456_dawid_skene")(spark, sfDir).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(2) == majority(id), s"majority $id")
      assert(r.getString(4) == expected(id), s"DS label $id")
      assert(r.getBoolean(3) == (majority(id) == r.getString(1)))
      assert(r.getBoolean(6) == (expected(id) == r.getString(1)))
    }
    val mAcc = got.count(_.getBoolean(3))
    val dAcc = got.count(_.getBoolean(6))
    assert(dAcc >= mAcc,
      s"confusion-aware labels must not lose to majority ($mAcc -> $dAcc)")
  }

  /** Lexicographically-smallest tie-break under maxBy: order strings by
    * REVERSED comparison so the max picks the smallest label. */
  private case class ReverseLex(s: String) extends Ordered[ReverseLex] {
    def compare(that: ReverseLex): Int = that.s.compareTo(s)
  }
}
