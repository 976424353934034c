package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DupClusters
import graft.queries.{CurationQueries, DocQueries, LmQueries, QualityQueries,
  SplitQueries, TextMetricsQueries}

/** Constructed-fixture pins for the round-15 census queries: q394's
  * four count columns and three rates on documents with hand-countable
  * token/char/byte totals (including a multi-byte char, where UTF-8
  * bytes ≠ chars), and q395's packing arithmetic on two documents whose
  * truncation/padding masses are exact by hand. */
class Round15Spec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("q394: fertility counts and rates are exact on constructed docs") {
    val dir = Files.createTempDirectory("graft-q394")
    Seq((1L, "Hello world!", "en"), (2L, "héllo", "fr"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextMetricsQueries
      .q394TokenizerFertility(spark, dir.toString)
      .collect().map(r => r.getAs[String]("lang") -> r).toMap

    val en = rows("en") // ws: [Hello, world!]; bpe: H | ello | world | !
    assert(en.getAs[Long]("ws_tokens") == 2L)
    assert(en.getAs[Long]("bpe_tokens") == 4L)
    assert(en.getAs[Long]("chars") == 12L)
    assert(en.getAs[Long]("bytes_utf8") == 12L)
    assert(en.getAs[Double]("fertility") == 2.0)
    assert(en.getAs[Double]("bytes_per_bpe_token") == 3.0)
    assert(en.getAs[Double]("chars_per_ws_token") == 6.0)

    val fr = rows("fr") // bpe: h | é | llo; é is 2 UTF-8 bytes
    assert(fr.getAs[Long]("ws_tokens") == 1L)
    assert(fr.getAs[Long]("bpe_tokens") == 3L)
    assert(fr.getAs[Long]("chars") == 5L)
    assert(fr.getAs[Long]("bytes_utf8") == 6L)
    assert(fr.getAs[Double]("fertility") == 3.0)
    assert(fr.getAs[Double]("bytes_per_bpe_token") == 2.0)
  }

  test("q395: truncation, padding, and packed-sequence math are exact") {
    val dir = Files.createTempDirectory("graft-q395")
    val doc = (p: String, n: Int) => (1 to n).map(i => s"$p$i").mkString(" ")
    Seq((1L, doc("a", 100), "en"), (2L, doc("b", 300), "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val rows = SplitQueries.q395PackingCurve(spark, dir.toString)
      .collect().map(r => r.getAs[Long]("max_len") -> r).toMap
    assert(rows.keySet == Set(128L, 256L, 512L, 1024L, 2048L))

    val r128 = rows(128L)
    assert(r128.getAs[Long]("n_docs") == 2L)
    assert(r128.getAs[Long]("total_tokens") == 400L)
    assert(r128.getAs[Long]("tokens_truncated") == 172L, "300 − 128")
    assert(r128.getAs[Long]("pad_tokens") == 28L, "128 − 100")
    assert(r128.getAs[Double]("pad_frac") == 0.109375, "28 / 256")
    assert(r128.getAs[Long]("n_seqs_packed") == 4L, "⌈400/128⌉")
    assert(r128.getAs[Double]("packed_pad_frac") == 0.21875, "112 / 512")

    val r256 = rows(256L)
    assert(r256.getAs[Long]("tokens_truncated") == 44L)
    assert(r256.getAs[Long]("pad_tokens") == 156L)
    assert(r256.getAs[Long]("n_seqs_packed") == 2L)

    val r512 = rows(512L)
    assert(r512.getAs[Long]("tokens_truncated") == 0L)
    assert(r512.getAs[Long]("pad_tokens") == 624L, "412 + 212")
    assert(r512.getAs[Long]("n_seqs_packed") == 1L)
    assert(r512.getAs[Double]("packed_pad_frac") == 0.21875, "112 / 512")
  }

  // q396 geometry on the q45 variant fixture (A, A+3-token tail,
  // A+6-token tail): with n word-trigrams in the base doc, the pairwise
  // Jaccards are n/(n+3), (n+3)/(n+6), n/(n+6) — a 30-token doc
  // (n = 28) makes all three ≥ 0.7 (a verified TRIANGLE), a 12-token
  // doc (n = 10) drops A–C to 10/16 = 0.625 < 0.7 (a CHAIN: the CC
  // merge keeps the cluster, density exposes the unverified pair).
  test("q396: triangles score density 1, chains are flagged with exact geometry") {
    val dir = Files.createTempDirectory("graft-q396")
    val mk = (p: String, n: Int) => (1 to n).map(i => s"$p$i").mkString(" ")
    Seq((10L, mk("a", 30), "en"), (20L, mk("b", 12), "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val rows = DupClusters.q396ClusterQuality(spark, dir.toString)
      .collect().map(r => r.getAs[Long]("cluster_id") -> r).toMap
    assert(rows.keySet == Set(10L, 20L))

    val tri = rows(10L)
    assert(tri.getAs[Long]("n_members") == 3L)
    assert(tri.getAs[Long]("n_edges") == 3L)
    assert(tri.getAs[Double]("density") == 1.0)
    assert(tri.getAs[Boolean]("is_clique"))
    assert(tri.getAs[Double]("min_edge_jaccard") == 0.823529, "28/34")

    val chain = rows(20L)
    assert(chain.getAs[Long]("n_members") == 3L)
    assert(chain.getAs[Long]("n_edges") == 2L, "A-C at 10/16 < 0.7 is absent")
    assert(chain.getAs[Double]("density") == 0.666667)
    assert(!chain.getAs[Boolean]("is_clique"))
    assert(chain.getAs[Double]("min_edge_jaccard") == 0.769231, "10/13")
  }

  // q397 must agree with the registered shuffle operator itself: the
  // audit's per-shard doc counts are q57's own shard assignment,
  // re-derived — reconcile them row-for-row on the fixture corpus, and
  // pin the structural contract (all 16 shards reported, counts
  // conserve the corpus, a constructed one-doc source still audits).
  test("q397 reconciles with q57's shard assignment and conserves the corpus") {
    val dir = "/root/testdata/sf0.001"
    val fromQ57 = CurationQueries.q57GlobalShuffle(spark, dir)
      .groupBy("shard").count().collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("count")).toMap
    val audit = CurationQueries.q397ShardBalance(spark, dir).collect()
    assert(audit.length == 16, "every shard reports, even if empty")
    audit.foreach { r =>
      val s = r.getAs[Int]("shard")
      assert(r.getAs[Long]("n_docs") == fromQ57.getOrElse(s, 0L),
        s"shard $s count must equal q57's assignment")
      assert(r.getAs[Double]("max_source_dev") >= 0.0)
    }
    assert(audit.map(_.getAs[Long]("n_docs")).sum == fromQ57.values.sum)
  }

  // q398's cells must PARTITION the scored corpus per language AND
  // reconcile cell-for-cell with the gates recomputed directly from the
  // registered per-doc plans (q23 quality, q59 NLL) — the audit is a
  // pure census of those two columns.
  test("q398 cells reconcile with the gates recomputed from q23/q59") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val expected = LmQueries.q59UnigramNll(spark, dir)
      .select(col("doc_id"), col("lang"), col("avg_nll"))
      .join(DocQueries.q23DocQuality(spark, dir)
        .select(col("doc_id"), col("quality")), "doc_id")
      .collect()
      .groupBy(r => (r.getAs[String]("lang"),
        r.getAs[Double]("quality") >= 0.5,
        r.getAs[Double]("avg_nll") <= 8.0))
      .map { case (k, rs) => k -> rs.length.toLong }
    val cells = QualityQueries.q398FilterOverlap(spark, dir).collect()
    val got = cells.map(r => (r.getAs[String]("lang"),
      r.getAs[Boolean]("q_pass"), r.getAs[Boolean]("nll_pass")) ->
      r.getAs[Long]("n_docs")).toMap
    assert(got == expected, "every reported cell must equal the recomputed gate census")
    assert(cells.exists(r => !r.getAs[Boolean]("q_pass")), "quality gate fires")
    cells.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val shares = rs.map(_.getAs[Double]("doc_share")).sum
      assert(math.abs(shares - 1.0) < 1e-4, s"$lang shares must sum to 1")
    }
  }

  // q399's six cells must conserve q45's verified edge set exactly, and
  // the fixture (variant ids scattered by the hash split) must leak
  // across splits — the off-diagonal mass the audit exists to expose.
  test("q399 conserves the verified edge count and exposes cross-split leaks") {
    val dir = "/root/testdata/sf0.001"
    val sh = DupClusters.q45ShingleTable(spark, dir)
    val edgeTotal = DupClusters.jaccardEdges(sh, 0.7).count()
    sh.unpersist()
    val cells = SplitQueries.q399NearDupLeakage(spark, dir).collect()
    assert(cells.length == 6)
    val total = cells.map(_.getAs[Long]("n_neardup_pairs")).sum
    assert(total == edgeTotal, "six cells must partition the edge set")
    val offDiag = cells.filter(r =>
      r.getAs[String]("split_a") != r.getAs[String]("split_b"))
      .map(_.getAs[Long]("n_neardup_pairs")).sum
    assert(offDiag > 0, "hash-scattered variants must straddle splits")
  }

  // q400's ledger invariants: doc counts monotone non-increasing
  // through the gates, token mass never grows, the rewrite stage keeps
  // docs while cutting tokens, the perplexity stage drops EXACTLY the
  // injected gibberish docs (no natural doc at this fixture scores near
  // the 8.0 cut — q391's sweep measures the natural ceiling ~3.7), and
  // the packing row is exact ceil arithmetic on the surviving mass.
  test("q400 ledger: gate monotonicity, rewrite semantics, injection counts") {
    import org.apache.spark.sql.functions.{col, length, trim}
    val dir = "/root/testdata/sf0.001"
    val rows = CurationQueries.queries // touch to keep imports honest
    val ledger = graft.queries.CurationPipeline.q400CurationV2(spark, dir)
      .collect().map(r => r.getAs[Int]("stage_no") -> r).toMap
    assert(ledger.size == 8 && rows.nonEmpty)
    def docs(i: Int) = ledger(i).getAs[Long]("n_docs")
    def toks(i: Int) = ledger(i).getAs[Long]("n_tokens")
    (1 to 6).foreach { i =>
      assert(docs(i) <= docs(i - 1), s"stage $i must not add docs")
      assert(toks(i) <= toks(i - 1), s"stage $i must not add tokens")
    }
    // the rewrite keeps every doc and cuts tokens (the fixture plants
    // 24-token excerpts, so the cut is strict)
    assert(docs(5) == docs(4), "substring rewrite never drops a doc")
    assert(toks(5) < toks(4), "planted excerpts must be excised")
    // the perplexity stage drops exactly the injected noise docs
    val noiseCount = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(trim(col("text"))) > 0)
      .filter(col("doc_id") % 10 =!= 7 && col("doc_id") % 9 === 4)
      .count()
    assert(docs(1) - docs(2) == noiseCount,
      "NLL gate kills the gibberish injections and nothing else")
    // loop + contamination gates both fire on their planted prey
    assert(docs(3) < docs(2), "loop gate fires")
    assert(docs(6) < docs(5), "contamination gate fires")
    // packing: exact ceil over the surviving token mass
    assert(toks(7) == toks(6))
    assert(ledger(7).getAs[Long]("n_docs") == (toks(6) + 511) / 512)
  }

  // q401's curve contract: recall and candidate volume are monotone in
  // nprobe, probing ALL 16 cells recovers brute force exactly (recall
  // and share both 1.0 — the DocOpsSpec ivf≡brute-force theorem read off
  // the curve), and hits never exceed candidates.
  test("q401: the nprobe curve is monotone and exact at full probe") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.EmbedQueries.q401NprobeCurve(spark, dir)
      .collect().sortBy(_.getAs[Int]("nprobe"))
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq == Seq(1, 2, 4, 8, 16))
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Double]("recall_at10") <=
        hi.getAs[Double]("recall_at10"), "recall must be monotone")
      assert(lo.getAs[Long]("candidates") <= hi.getAs[Long]("candidates"))
    }
    rows.foreach(r =>
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("candidates")))
    val full = rows.last
    assert(full.getAs[Double]("recall_at10") == 1.0)
    assert(full.getAs[Double]("candidate_share") == 1.0)
  }

  // q402's exact conservation identities against the shared graph:
  // Σ n_nodes = |labeled nodes|, Σ degree_sum = 2m (every endpoint of
  // every undirected edge lands in exactly one community), and
  // Σ intra_edges ≤ m with equality iff no edge crosses communities.
  test("q402 conserves nodes, degrees, and edges of the q162 graph") {
    import graft.queries.MiningQueries
    val dir = "/root/testdata/sf0.001"
    val (pairs, _, labels) = MiningQueries.partGraph(spark, dir)
    val m = pairs.count()
    val nNodes = labels.count()
    val rows = MiningQueries.q402Modularity(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == nNodes)
    assert(rows.map(_.getAs[Long]("degree_sum")).sum == 2 * m,
      "degree mass must equal twice the undirected edge count")
    val intra = rows.map(_.getAs[Long]("intra_edges")).sum
    assert(intra <= m)
    // min-label propagation converges clusters to near-components on
    // this fixture; Q must at least be a valid partition score
    val q = rows.map(_.getAs[Double]("contribution")).sum
    assert(q >= -0.5 && q <= 1.0)
  }

  // q403's closed form is hand-checkable: MDE scales as 1/√n, so the
  // 1k→100k rows must differ by exactly the snapped factor 10, and a
  // JVM replay of the (z, σ, n) chain must reproduce every cell.
  test("q403 MDE table replays the closed form exactly") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.ExperimentQueries.q403MdeTable(spark, dir)
      .collect().map(r => r.getAs[Long]("n_per_arm") -> r).toMap
    assert(rows.keySet == Set(1000L, 10000L, 100000L, 1000000L))
    // JVM replay from the exact cents sums
    val cents = graft.queries.Kpis.table(spark, dir, "orders")
      .select(org.apache.spark.sql.functions.round(col("o_totalprice") *
        100).cast("long").as("c"))
      .collect().map(_.getAs[Long]("c"))
    val n = cents.length.toDouble
    val s1 = cents.map(BigDecimal(_)).sum.toDouble
    val s2 = cents.map(c => BigDecimal(c) * BigDecimal(c)).sum.toDouble
    val varC = (s2 - s1 * s1 / n) / (n - 1.0)
    val z = 1.959964 + 0.841621
    def snap(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
    Seq(1000L, 10000L, 100000L, 1000000L).foreach { np =>
      val expected = snap(z * math.sqrt(varC) *
        math.sqrt(2.0 / np.toDouble) / 100.0)
      assert(rows(np).getAs[Double]("mde_abs") == expected,
        s"n=$np must replay the closed form")
    }
  }

  // q404 is q352's runs rolled up by bench item: every leaking corpus
  // doc appears under at least one bench item, so Σ n_leaking_docs must
  // cover q352's flagged-doc count; the injected 30-token quotes must
  // surface; fractions are valid shares of each item.
  test("q404 bench-leak census reconciles with q352's contaminated docs") {
    import graft.queries.SubstringQueries
    val dir = "/root/testdata/sf0.001"
    val contamDocs = SubstringQueries.q352ContamSpans(spark, dir).count()
    val rows = SubstringQueries.q404BenchLeaks(spark, dir).collect()
    assert(rows.nonEmpty, "the injected quotes must leak")
    rows.foreach { r =>
      val f = r.getAs[Double]("leaked_frac")
      assert(f > 0.0 && f <= 1.0)
      assert(r.getAs[Long]("leaked_tokens") <= r.getAs[Long]("n_tokens"))
    }
    assert(rows.map(_.getAs[Long]("n_leaking_docs")).sum >= contamDocs,
      "every contaminated doc leaks at least one bench item")
    assert(rows.exists(_.getAs[Long]("longest_leak_tokens") >= 30L),
      "the 30-token injected quote is recovered")
  }
}
