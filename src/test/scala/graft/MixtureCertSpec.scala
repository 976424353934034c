package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q433 mixture-materialization certificate: the greedy hash-order prefix
  * must realize each source's τ=2 allocation within the exact bound the
  * certificate claims (alloc ≤ realized < alloc + boundary-doc tokens),
  * and a source whose τ=2 upsampling EXCEEDS its supply (effective
  * epochs > 1 — the case the balanced sf fixtures never populate) must
  * surface as capped=1 with its entire supply materialized. Ground truth
  * for the uncapped source is recomputed in plain Scala: JDK MessageDigest
  * md5 → first 15 hex digits as the 60-bit key, sort, prefix-sum — no
  * Spark expressions shared with the implementation. */
class MixtureCertSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def md5Hash60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("capped and uncapped sources both certify, matching plain-Scala ground truth") {
    // big: 200 docs x 50 tokens = 10000; tiny: 2 docs x 8 tokens = 16.
    // sqrt masses 100 vs 4 -> tau2 shares ~0.9615/0.0385 of B = 6009
    // -> tiny alloc ~231 >> 16 (capped), big alloc ~5778 < 10000.
    val docs =
      (1L to 200L).map(i => (i, "big", (1 to 50).map(t => s"w${i}_$t").mkString(" "))) ++
        Seq((9001L, "tiny", (1 to 8).map(t => s"t$t").mkString(" ")),
          (9002L, "tiny", (1 to 8).map(t => s"u$t").mkString(" ")))
    val dir = Files.createTempDirectory("graft-mixcert").toString
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = SparkEntry.queries("q433_mixture_cert")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out.keySet == Set("big", "tiny"))

    val tiny = out("tiny")
    assert(tiny.getAs[Int]("capped") == 1)
    assert(tiny.getAs[Int]("bound_ok") == 1)
    assert(tiny.getAs[Long]("realized_tokens") == 16L)
    assert(tiny.getAs[Long]("n_docs_sampled") == 2L)
    assert(tiny.getAs[Long]("target_tokens") > 16L,
      "tiny's tau2 allocation must exceed its supply for the test to bite")

    // plain-Scala ground truth for the big source's greedy prefix
    val sqBig = BigDecimal(math.sqrt(10000.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val sqTiny = BigDecimal(math.sqrt(16.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val b = (10016L * 3) / 5
    val allocBig =
      math.floor(sqBig.toDouble / (sqBig + sqTiny).toDouble * b.toDouble).toLong
    val ordered = (1L to 200L).map(i => (md5Hash60(s"mix$i"), i)).sorted
    var cum = 0L; var n = 0L; var boundary = 0L
    ordered.foreach { _ =>
      if (cum < allocBig) { cum += 50L; n += 1; boundary = 50L }
    }
    val big = out("big")
    assert(big.getAs[Int]("capped") == 0)
    assert(big.getAs[Int]("bound_ok") == 1)
    assert(big.getAs[Long]("target_tokens") == allocBig)
    assert(big.getAs[Long]("realized_tokens") == cum)
    assert(big.getAs[Long]("n_docs_sampled") == n)
    assert(cum >= allocBig && cum - allocBig < boundary)
  }

  test("single-source corpus: exact ceil(B / doc_tokens) docs, overshoot under one doc") {
    // equal-length docs make the greedy prefix's arithmetic closed-form:
    // share = 1, B = 60% of mass, every doc 10 tokens -> exactly
    // ceil(B/10) docs sampled and overshoot strictly below one doc. The
    // budget-independence of the ORDER (what makes the sample a prefix,
    // monotone in B) is the md5 key itself — pinned by the ground-truth
    // replay in the first test and the suite-wide determinism check.
    val base = (1L to 60L).map(i =>
      (i, "s", (1 to 10).map(t => s"w${i}_$t").mkString(" ")))
    val dir = Files.createTempDirectory("graft-mixcert2").toString
    base.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = SparkEntry.queries("q433_mixture_cert")(spark, dir).head()
    assert(row.getAs[Long]("overshoot") >= 0L &&
      row.getAs[Long]("overshoot") < 10L)
    assert(row.getAs[Long]("n_docs_sampled") ==
      math.ceil(600L * 0.6 / 10.0).toLong)
    assert(row.getAs[Int]("bound_ok") == 1)
  }

  test("q439 incremental re-cert: delta shifts every allocation, delta docs enter prefixes, bounds re-certify") {
    // two sources; only 'grow' receives delta docs (ids = 2 mod 5 spawn
    // +1e12 re-crawls with a 3-token tail; 2 mod 5 means last digit 2 or
    // 7), so its allocation must rise by MORE than the budget-growth
    // alone gives 'flat'
    val docs = (1L to 100L).map(i =>
      (i, if (i % 10 == 2 || i % 10 == 7) "grow" else "flat",
        (1 to 20).map(t => s"w${i}_$t").mkString(" ")))
    val dir = Files.createTempDirectory("graft-mixdelta").toString
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q439_mixture_delta")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out.keySet == Set("grow", "flat"))
    val grow = out("grow"); val flat = out("flat")
    // delta mass lands only on 'grow': ids = 2 mod 5 are all even
    assert(grow.getAs[Long]("tokens_delta") > 0L &&
      flat.getAs[Long]("tokens_delta") == 0L)
    assert(grow.getAs[Long]("n_delta_docs_sampled") > 0L,
      "delta docs must interleave into the re-cut prefix")
    assert(flat.getAs[Long]("n_delta_docs_sampled") == 0L)
    // both allocations shift (the tau2 normalizer couples them), and
    // grow's shift strictly exceeds flat's
    assert(grow.getAs[Long]("alloc_shift") >
      flat.getAs[Long]("alloc_shift"),
      s"grow must gain more than flat: " +
        s"${grow.getAs[Long]("alloc_shift")} vs " +
        s"${flat.getAs[Long]("alloc_shift")}")
    assert(out.values.forall(_.getAs[Int]("bound_ok") == 1),
      "every re-certified source must satisfy the exact bound")
    // the realized masses obey the q433 bound against the NEW allocs
    out.values.foreach { r =>
      val alloc = r.getAs[Long]("target_tokens")
      val realized = r.getAs[Long]("realized_tokens")
      assert(realized >= alloc && realized - alloc < 23L,
        s"${r.getAs[String]("source")}: $realized vs $alloc")
    }
  }
}
