package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.functions.VectorFunctions
import graft.queries.{DocQueries, EmbedQueries}

/** Specs for the LLM-pipeline operators: dedup (exact/MinHash/SimHash),
  * similarity search (brute-force + LSH), text analysis. */
class DocOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}
  import spark.implicits._

  test("tokens/tokenCount guard the empty string") {
    val df = Seq("", "   ", "one", " a  b   c ").toDF("text")
      .select(TextFunctions.tokenCount(col("text")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 1, 3))
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val fps = Seq("The  Quick Fox", "the quick fox", "the quick foxx")
      .toDF("text").select(TextFunctions.fingerprint(col("text"))).collect()
    assert(fps(0) == fps(1))
    assert(fps(1) != fps(2))
  }

  test("shingles: n-grams, short docs collapse to one shingle") {
    val sh = Seq("a b c d", "a b").toDF("text")
      .select(TextFunctions.shingles(
        TextFunctions.tokens(col("text")), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1) == Seq("a b"))
  }

  test("jaccard of identical sets is 1.0, disjoint is 0.0") {
    val df = Seq((Seq("x", "y"), Seq("x", "y"), Seq("p", "q")))
      .toDF("a", "b", "c")
    val r = df.select(
      TextFunctions.jaccard(col("a"), col("b")),
      TextFunctions.jaccard(col("a"), col("c"))).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("simhash: identical token arrays give distance 0, disjoint give large") {
    val df = Seq(("a b c d e f g h", "a b c d e f g h"),
                 ("a b c d e f g h", "q r s t u v w x"))
      .toDF("t1", "t2")
      .withColumn("k1", TextFunctions.tokenHashes(TextFunctions.tokens(col("t1"))))
      .withColumn("k2", TextFunctions.tokenHashes(TextFunctions.tokens(col("t2"))))
      .withColumn("h1", TextFunctions.simhash(col("k1")))
      .withColumn("h2", TextFunctions.simhash(col("k2")))
      .select(TextFunctions.hamming(col("h1"), col("h2")))
    val d = df.collect().map(_.getInt(0))
    assert(d(0) == 0)
    assert(d(1) > 10)
  }

  test("minhash near-dup finds every injected clone pair, none spurious below 0.5") {
    val pairs = DocQueries.q22NearDupMinhash(spark, sfDir).collect()
    val clonePairs = pairs.filter(r =>
      r.getAs[Long]("b_id") - r.getAs[Long]("a_id") == 100000L)
    // 500 docs → 50 clones injected; banding (8 bands × 2 rows, J≳0.7)
    // must recall all of them.
    assert(clonePairs.length == 50, s"recall: ${clonePairs.length}/50")
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("minhash verified pairs equal the exact-Jaccard ground truth over ALL pairs") {
    // Strongest available check for the rows-only q22 (VERDICT r2 #5): the
    // banded pipeline can only MISS pairs (false positives are pruned by its
    // own exact-Jaccard verification), so set-equality against the brute-force
    // all-pairs ground truth proves 100% candidate recall AND exact scores.
    // All-pairs is fine here: 550 docs at sf0.001, test-only.
    val base = DocQueries.corpusWithNearDups(spark, sfDir)
      .withColumn("sh", TextFunctions.shingles(TextFunctions.tokens(col("text")), 3))
      .select(col("doc_id"), col("sh"))
    val a = base.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val b = base.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val truth = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        TextFunctions.jaccard(col("a_sh"), col("b_sh")).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = DocQueries.q22NearDupMinhash(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("jaccard"))).toSet
    assert(got == truth,
      s"banding missed ${(truth -- got).size} pairs / fabricated ${(got -- truth).size}")
  }

  test("simhash verified pairs equal the exact-Hamming ground truth over ALL pairs") {
    // Same strongest-available check for q27: chunk-join candidates are
    // pigeonhole-complete for Hamming ≤ 4, so the verified output must equal
    // the brute-force all-pairs ground truth exactly.
    val base = DocQueries.corpusWithNearDups(spark, sfDir)
      .withColumn("sh64",
        TextFunctions.simhash(TextFunctions.tokenHashes(TextFunctions.tokens(col("text")))))
      .select(col("doc_id"), col("sh64"))
    val a = base.select(col("doc_id").as("a_id"), col("sh64").as("a_h"))
    val b = base.select(col("doc_id").as("b_id"), col("sh64").as("b_h"))
    val truth = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        TextFunctions.hamming(col("a_h"), col("b_h")).as("d"))
      .filter(col("d") <= 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = DocQueries.q27SimhashNearDup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Int]("hamming_dist"))).toSet
    assert(got == truth,
      s"chunking missed ${(truth -- got).size} pairs / fabricated ${(got -- truth).size}")
  }

  test("exact-dup groups: exactly the 50 injected clones, n_copies=2") {
    val groups = DocQueries.q19ExactDupDocs(spark, sfDir).collect()
    assert(groups.length == 50)
    assert(groups.forall(_.getAs[Long]("n_copies") == 2L))
    assert(groups.forall(r =>
      r.getAs[Long]("last_id") - r.getAs[Long]("first_id") == 100000L))
  }

  test("cosine top-k: ranks ordered by descending similarity, no self-match") {
    val rows = EmbedQueries.q21CosineTopk(spark, sfDir).collect()
    assert(rows.length == 50) // 5 queries × 10
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sortBy(-_)), s"query $q not descending")
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q))
    }
  }

  test("banded q26 equals the all-pairs near-dup ground truth") {
    // The registered q26 generates candidates from a (band, band_val)
    // equi-join; this asserts the banding lost NO pair vs the O(N²) form
    // (i.e. banded ⊇ ground truth; ⊆ holds because the exact cosine ≥ 0.4
    // verify runs on both paths) — bit-exact cosines included.
    val truth = EmbedQueries.q26AllPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("cos_sim"))).toSet
    val banded = EmbedQueries.q26EmbeddingNearDup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("cos_sim"))).toSet
    assert(truth.nonEmpty)
    assert(banded == truth,
      s"banding missed ${(truth -- banded).size} pairs / " +
        s"fabricated ${(banded -- truth).size}")
    // plan-shape guard: the q26 pipeline must generate candidates from an
    // equi-join on the band key, never an all-pairs product. Inspect the
    // PLAN-ONLY variant: the registered entry ends in an eager
    // localCheckpoint, whose executed plan is just a scan of cached rows —
    // asserting on it would be vacuous (r5 advisor finding).
    val plan = EmbedQueries.nearDupPairsPlanOnly(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"q26 candidate generation lost its equi-join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q26 plan regressed to an all-pairs product:\n$plan")
  }

  test("q50 semantic-dedup clusters equal a brute-force union-find closure") {
    // ground truth: all-pairs cosine edges (the unregistered O(N²) form)
    // + plain Scala union-find — independent of both the banded candidate
    // generator and the Spark connected-components loop
    val edges = EmbedQueries.q26AllPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    assert(edges.nonEmpty)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val members = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byComp = members.groupBy(find)
    val expected = byComp.toSeq.flatMap { case (_, ms) =>
      val cid = ms.min
      ms.toSeq.map(m => (m, cid, ms.length.toLong, if (m == cid) 1 else 0))
    }.toSet
    val got = EmbedQueries.q50SemanticDedup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Int]("is_rep"))).toSet
    assert(got == expected)
    // the fixture must exercise a real multi-member merge, not just pairs
    assert(expected.exists(_._3 > 2L))
  }

  test("knn join: ranked neighbor lists, exact cosines, deterministic") {
    val rows = EmbedQueries.q53KnnJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("vec_id")).foreach { case (v, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq == (1 to ranks.length), s"vec $v ranks not contiguous")
      assert(ranks.length <= 3)
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sortBy(-_)), s"vec $v not descending")
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == v), s"vec $v self-match")
    }
    // candidate cosines must be the exact values the brute-force path
    // computes for the same pairs
    val brute = EmbedQueries.q26AllPairs(spark, sfDir).collect()
      .flatMap(r => {
        val (a, b, c) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
          r.getAs[Double]("cos_sim"))
        Seq((a, b) -> c, (b, a) -> c)
      }).toMap
    rows.foreach { r =>
      val key = (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))
      brute.get(key).foreach(c => assert(c == r.getAs[Double]("cos_sim")))
    }
    val again = EmbedQueries.q53KnnJoin(spark, sfDir).collect()
    assert(rows.sameElements(again))
  }

  test("mixture sampling: rates monotone, hash-stable, bounds respected") {
    val rows = graft.queries.SplitQueries.q52MixtureSample(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("lang")).toSeq.sorted ==
      graft.queries.SplitQueries.MixRates.map(_._1).sorted)
    rows.foreach { r =>
      val (n, kept, target, realized) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_kept"), r.getAs[Double]("target_rate"),
        r.getAs[Double]("realized_rate"))
      assert(kept >= 0 && kept <= n)
      // realized tracks target within a generous binomial bound at ~100
      // docs/lang; rate-1.0 languages must keep EVERYTHING
      if (target == 1.0) assert(kept == n)
      else assert(math.abs(realized - target) < 0.2,
        s"${r.getAs[String]("lang")}: realized $realized vs target $target")
    }
    val again = graft.queries.SplitQueries.q52MixtureSample(spark, sfDir).collect()
    assert(rows.sameElements(again))
  }

  test("lsh ann results are a subset of brute-force ordering candidates") {
    val brute = EmbedQueries.q21CosineTopk(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"))).toSet
    val lsh = EmbedQueries.q28AnnLsh(spark, sfDir).collect()
    assert(lsh.nonEmpty)
    // every (q, n, sim) LSH returns must carry the same exact cosine the
    // brute-force path computes (when the pair appears in brute top-10)
    lsh.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim"))
      val inTop = brute.exists(b => b._1 == key._1 && b._2 == key._2)
      if (inTop) assert(brute.contains(key), s"cosine mismatch for $key")
    }
    // determinism
    val again = EmbedQueries.q28AnnLsh(spark, sfDir).collect()
    assert(lsh.sameElements(again))
  }

  test("ivf with nprobe=all equals brute force; partial probe is a valid subset") {
    val brute = EmbedQueries.q21CosineTopk(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    // probing every cell must reproduce brute-force exactly (same cosine
    // computation, same tiebreaks)
    val full = EmbedQueries.ivfTopK(spark, sfDir, nprobe = 16, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(full == brute)
    // partial probe: ≤k per query, deterministic, ranks contiguous from 1
    val part = EmbedQueries.q33AnnIvf(spark, sfDir).collect()
    assert(part.nonEmpty)
    part.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq == (1 to ranks.length))
    }
    val again = EmbedQueries.q33AnnIvf(spark, sfDir).collect()
    assert(part.sameElements(again))
  }

  test("native char-ngrams are identical to the SQL HOF specification") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("norm", TextFunctions.normText(col("text")))
      .withColumn("native", TextFunctions.charNgrams(col("norm"), 3))
      .withColumn("spec", TextFunctions.charNgramsSpec("norm", 3))
    assert(docs.filter(col("native") =!= col("spec")).count() == 0)
    // short-string collapse
    val s = Seq("ab").toDF("t")
      .select(TextFunctions.charNgrams(col("t"), 3)).head().getSeq[String](0)
    assert(s == Seq("ab"))
  }

  test("ngram language-id: predictions from the label set, confusion sums to corpus") {
    val rows = DocQueries.q35LangIdNgram(spark, sfDir).collect()
    val langs = Set("de", "en", "es", "fr", "zh")
    assert(rows.forall(r => langs(r.getAs[String]("lang"))))
    assert(rows.forall(r => langs(r.getAs[String]("predicted"))))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500)
    val again = DocQueries.q35LangIdNgram(spark, sfDir).collect()
    assert(rows.sameElements(again))
  }

  test("sketch profile tracks the exact operators within tolerance") {
    val sk = DocQueries.sketchProfile(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("approx_distinct_texts"),
          r.getAs[Double]("approx_median_tokens"))).toMap
    // q58 is the oracle-checked exact twin — pin the sketches against it
    val exact = DocQueries.q58ExactProfile(spark, sfDir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("distinct_texts"),
          r.getAs[Double]("median_tokens"))).toMap
    exact.foreach { case (lang, (d, m)) =>
      val (_, ad, am) = sk(lang)
      assert(math.abs(ad - d).toDouble / d <= 0.1, s"$lang distinct: $ad vs $d")
      assert(math.abs(am - m) / m <= 0.25, s"$lang median: $am vs $m")
    }
  }

  test("registered q41 certifies every sketch inside its oracle tolerance") {
    val rows = DocQueries.q41SketchProfile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      assert(r.getAs[Int]("hll_texts_ok") == 1, s"$lang HLL texts drifted")
      assert(r.getAs[Int]("hll_sources_ok") == 1, s"$lang HLL sources drifted")
      assert(r.getAs[Int]("tdigest_median_ok") == 1, s"$lang median drifted")
    }
  }

  test("corpus curation removes every injected clone and keeps originals") {
    val out = DocQueries.q42CorpusCuration(spark, sfDir).collect()
    val survivors = out.map(_.getAs[Long]("n_survivors")).sum
    // 500 originals + 50 near-clones injected. Every clone pairs with its
    // original at J≳0.7 and the original has the smaller id, so NO clone
    // survives (≤500). The 31-word fixture vocabulary also makes some
    // unrelated originals genuine J≥0.5 near-dups of each other, so the
    // operator correctly removes those too (measured 425 survivors).
    assert(survivors <= 500 && survivors >= 400, s"survivors: $survivors")
    assert(out.forall(_.getAs[Long]("min_doc_id") < 100000L))
    val again = DocQueries.q42CorpusCuration(spark, sfDir).collect()
    assert(out.sameElements(again))
  }

  test("dot product fold matches a manual computation") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(VectorFunctions.dotD(col("a"), col("b")))
    assert(df.head().getDouble(0) == (1.0 * 4.0 + 2.0 * 5.0 + 3.0 * 6.0))
  }

  test("native dot expression is bit-identical to the HOF specification") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("ae"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("be")))
      .filter(col("a_id") < col("b_id"))
      .select(
        VectorFunctions.dotD(col("ae"), col("be")).as("native"),
        VectorFunctions.dotHof(col("ae"), col("be")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("dot product on mismatched dimensions is NULL, matching the HOF spec") {
    // A dimension bug must surface as NULL (as the zip_with-null-pad HOF
    // does), never as a silently truncated partial dot product.
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f)))
      .toDF("a", "b")
      .select(
        VectorFunctions.dotD(col("a"), col("b")).as("native"),
        VectorFunctions.dotHof(col("a"), col("b")).as("hof"))
    val r = df.head()
    assert(r.isNullAt(0), "native must be NULL on length mismatch")
    assert(r.isNullAt(1), "HOF spec is NULL on length mismatch")
    // and via SQL (codegen path)
    val sqlRow = spark.sql(
      "SELECT dot_product_d(array(CAST(1 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)))").head()
    assert(sqlRow.isNullAt(0))
  }

  test("native simhash is bit-identical to the SQL HOF specification") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("hs", TextFunctions.tokenHashes(TextFunctions.tokens(col("text"))))
      .withColumn("native", TextFunctions.simhash(col("hs")))
      .withColumn("spec", TextFunctions.simhashSpec("hs"))
    assert(docs.filter(col("native") =!= col("spec")).count() == 0)
  }

  test("minhash signature: equal docs agree, k-length, deterministic") {
    val df = Seq("a b c d e f g", "a b c d e f g", "p q r s t u v")
      .toDF("text")
      .withColumn("sig", TextFunctions.minhashSignature(
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3), 16))
    val sigs = df.collect().map(_.getSeq[Long](1))
    assert(sigs.forall(_.length == 16))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("dot_product_d is registered for SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT dot_product_d(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)))").head()
    assert(r.getDouble(0) == 11.0)
  }

  test("char_ngrams is registered for SQL and requires a literal n") {
    val r = spark.sql("SELECT char_ngrams('abcd', 2)").head().getSeq[String](0)
    assert(r == Seq("ab", "bc", "cd"))
  }

  test("int8 quantization: byte range, 4x narrower type, <1% cosine error") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(200)
      .withColumn("scale", VectorFunctions.quantizeScale(col("embedding")))
      .withColumn("q8", VectorFunctions.quantize8(col("embedding"), col("scale")))
      .withColumn("deq", VectorFunctions.dequantize8(col("q8"), col("scale")))
    assert(e.schema("q8").dataType.simpleString == "array<tinyint>")
    // reconstruction keeps pairwise cosine within 1%
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("ae"),
        col("deq").as("da"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("be"),
        col("deq").as("db")))
      .filter(col("a_id") < col("b_id"))
      .select(
        VectorFunctions.cosine(col("ae"), col("be")).as("exact"),
        VectorFunctions.cosine(col("da"), col("db")).as("approx"))
    val maxErr = pairs
      .select(max(abs(col("exact") - col("approx")))).head().getDouble(0)
    assert(maxErr < 0.01, s"max cosine error $maxErr")
  }

  test("hyperplanes are deterministic across calls") {
    val a: Array[Double] = VectorFunctions.hyperplanes(4, 8).flatten
    val b: Array[Double] = VectorFunctions.hyperplanes(4, 8).flatten
    assert(a.sameElements(b))
    assert(a.forall(v => v >= -1.0 && v <= 1.0))
  }
}
