package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** Near-duplicate CLUSTERING: candidate pairs → similarity edges →
  * connected components → one cluster id per document. The missing last
  * stage of the dedup family (q19/q22/q27 emit pairs; a curation pipeline
  * needs per-doc cluster labels to keep one representative per component,
  * and pair-level dedup breaks on transitive chains A≈B≈C where A and C
  * are NOT directly similar). Extension scope — the reference's dedup
  * stops at pandas `drop_duplicates` (`dags/src/processor.py:73-77`).
  *
  * Candidate generation here is the inverted-index family (pairs sharing
  * any word n-gram shingle, with frequent-shingle pruning), complementing
  * the MinHash-band (q22), SimHash-chunk (q27) and sign-LSH (q28)
  * generators: every stage is an equi-join on shingle / id — no all-pairs
  * product. The df cap bounds the quadratic blowup a stop-word-like hot
  * shingle would cause (a shingle in d docs yields d² candidate rows; at
  * the cap that is a constant, and dropping ultra-common shingles loses
  * no discriminative signal — standard prefix-filtering practice).
  *
  * Connected components is iterative min-label propagation with path
  * halving: each round, every node takes the minimum component id among
  * itself and its neighbors (one equi-join plus one map-side-partial min
  * aggregate), then shortcuts through the cached label table
  * (comp ← labels[comp]) so long chains collapse in well under diameter
  * rounds (near-dup components are shallow in practice; `maxIter` guards
  * pathological chains). Each
  * round's label table is EAGERLY local-checkpointed and the previous one
  * dropped: the round's plan references the prior labels twice (the join
  * and the fallback), so without lineage truncation the logical plan
  * doubles per round and the driver dies on plan strings alone long
  * before data size matters — persist caches data but keeps lineage.
  * On a real cluster swap `localCheckpoint` for reliable `checkpoint`
  * every few rounds (executor loss discards local checkpoint blocks).
  * At 1000-executor scale the same loop runs unchanged — the per-round
  * cost is one shuffle of the EDGE table, and the star-contraction
  * variants (large-star/small-star) that cut rounds to O(log n) slot
  * into the same driver loop if diameters ever warrant it.
  */
object DupClusters {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Undirected connected components over an edge list. Returns one row
    * per node appearing in at least one non-self edge: (node, comp) where
    * comp = the minimum node id in the component. Node ids must be
    * integral (cast to long).
    *
    * Throws `IllegalStateException` if min-label propagation has not
    * converged after `maxIter` rounds — exiting silently would hand the
    * caller labels that look valid but under-merge components (a graph of
    * diameter > maxIter needs more rounds, or the O(log n)
    * large-star/small-star contraction).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame =
    connectedComponentsWithRounds(edges, srcCol, dstCol, maxIter)._1

  /** [[connectedComponents]] plus the number of propagation rounds it
    * took to converge (exposed so tests can pin the round count ==
    * graph diameter and catch accidental extra actions/rounds).
    *
    * ONE Spark action per round: the changed-label count is collected
    * via `observe` DURING the round's eager localCheckpoint
    * materialization, so convergence costs no separate job — the
    * previous shape (a second join + isEmpty per round) re-shuffled
    * both label tables once more per round just to answer "did
    * anything change?". */
  def connectedComponentsWithRounds(edges: DataFrame, srcCol: String,
                                    dstCol: String,
                                    maxIter: Int = 25): (DataFrame, Int) = {
    val fwd = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sym = fwd.where(col("src") =!= col("dst"))
      .unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      // pre-partition AND pre-sort the cached edge table on the per-round
      // join key: every propagation round joins sym on dst, and a cache
      // that already satisfies the join's partitioning + ordering means
      // rounds shuffle ONLY the (node-scale) label table — the edge
      // table, the dominant volume at scale, crosses the network once for
      // the whole loop instead of once per round. (Fixture-scale effect
      // is within bench noise; the win is proportional to |edges|.)
      .repartition(col("dst"))
      .sortWithinPartitions("dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    try {
      while (!converged && i < maxIter) {
        val viaNeighbors = sym.join(labels, sym("dst") === labels("node"))
          .groupBy(sym("src").as("nnode"))
          .agg(min("comp").as("ncomp"))
        val obs = org.apache.spark.sql.Observation()
        val stepped = labels
          .join(viaNeighbors, labels("node") === viaNeighbors("nnode"), "left")
          .select(labels("node"), labels("comp").as("oldComp"),
            least(labels("comp"), coalesce(col("ncomp"), labels("comp")))
              .as("comp"))
        // path halving: also take the label OF the label (comp is always
        // some member's node id, so labels[comp] is sound and ≤ comp) —
        // long chains collapse in far fewer rounds (a diameter-16 fixture
        // graph drops 17 → 12). The lookup joins the CACHED start-of-round
        // label table keyed by node — node-scale, cheap — NOT a second
        // pass over the edge table, so the per-round dominant cost (the
        // sym shuffle) is unchanged at scale.
        val lookup = labels.select(col("node").as("hn"), col("comp").as("hc"))
        val next = stepped
          .join(lookup, stepped("comp") === lookup("hn"), "left")
          .select(stepped("node"), stepped("oldComp"),
            least(stepped("comp"), coalesce(col("hc"), stepped("comp")))
              .as("comp"))
          .observe(obs,
            coalesce(sum(when(col("comp") =!= col("oldComp"), 1L)
              .otherwise(0L)), lit(0L)).as("n_changed"))
          .select(col("node"), col("comp"))
          .localCheckpoint(true)
        // the eager checkpoint above IS the round's single action; the
        // observation was populated by it, so get returns immediately.
        // (Superseded rounds' checkpoint blocks become unreferenced here
        // and are reclaimed by the ContextCleaner.)
        converged = obs.get.apply("n_changed").asInstanceOf[Long] == 0L
        labels = next
        i += 1
      }
    } finally sym.unpersist()
    if (!converged) {
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIter=$maxIter " +
          "rounds; labels would be silently under-merged. Raise maxIter " +
          "(diameter-many rounds needed) for this graph.")
    }
    log.info(s"connectedComponents converged in $i rounds")
    (labels, i)
  }

  /** Inverted-index candidate pairs: distinct (a, b), a < b, sharing at
    * least one shingle whose document frequency is ≤ dfCap. Input must
    * have columns (id: long, sh: array<string>) with sh already distinct.
    */
  def shingleCandidatePairs(docsWithShingles: DataFrame, dfCap: Int): DataFrame = {
    val inv = docsWithShingles
      .select(col("id"), explode(col("sh")).as("s"))
      .distinct()
    val kept = inv.groupBy("s").agg(count(lit(1)).as("df"))
      .where(col("df") <= dfCap)
      .select("s")
    inv.join(kept, "s")
      .join(inv.withColumnRenamed("id", "id2"), "s")
      .where(col("id") < col("id2"))
      .select(col("id").as("a"), col("id2").as("b"))
      .distinct()
  }

  /** q45: the full pipeline on a deterministic derived corpus — every
    * 10th document plus two appended-tail variants (ids +100000/+200000,
    * the same clone-id convention as q19/q22; fixture doc ids are far
    * below the offset). With threshold 0.7, orig↔v1 and v1↔v2 edges
    * always pass, but orig↔v2 FAILS for short documents
    * ((T-2)/(T+4) < 0.7 below ~21 tokens; the fixture has 11-token docs)
    * — those components only assemble through transitive propagation,
    * so the oracle genuinely checks the closure, not just the edge list.
    */
  /** q45's derived corpus (every 10th doc + two appended-tail variants)
    * with distinct 3-shingles, spread across cores and PERSISTED — the
    * caller must unpersist. Shared with [[graft.Profile45]] so the
    * profiler measures exactly the registered pipeline's stages. */
  private[graft] def q45ShingleTable(spark: SparkSession, dir: String): DataFrame = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    def variant(offset: Long, tail: String): DataFrame =
      base.select((col("doc_id") + offset).as("id"),
        (if (tail.isEmpty) col("text") else concat(col("text"), lit(tail)))
          .as("text"))
    val variants = variant(0L, "")
      .unionByName(variant(100000L, " zz extra tail"))
      .unionByName(variant(200000L, " zz extra tail rr more pad"))
    variants
      .select(col("id"),
        array_distinct(TextFunctions.shingles(
          TextFunctions.tokens(col("text")), 3)).as("sh"))
      // single-file fixture scan = one split; spread before the per-row
      // shingling + the joins below (q29's lesson)
      .repartition(variants.sparkSession.sparkContext.defaultParallelism,
        col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Exact-Jaccard-verified similarity edges over a (id, sh) shingle
    * table: df-capped inverted-index candidates, then the threshold
    * verify. Shared with [[graft.Profile45]]. */
  private[graft] def jaccardEdges(withShingles: DataFrame, dfCap: Int,
                                  threshold: Double): DataFrame =
    shingleCandidatePairs(withShingles, dfCap)
      .join(withShingles.select(col("id").as("a"), col("sh").as("sa")), "a")
      .join(withShingles.select(col("id").as("b"), col("sh").as("sb")), "b")
      .where(TextFunctions.jaccard(col("sa"), col("sb")) >= threshold)
      .select("a", "b")

  def q45DupClusters(spark: SparkSession, dir: String): DataFrame = {
    val withShingles = q45ShingleTable(spark, dir)
    val edges = jaccardEdges(withShingles, dfCap = 20, threshold = 0.7)
    val comp = connectedComponents(edges, "a", "b")
    val sizes = comp.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
    // Eagerly materialize the (tiny: one row per clustered doc) final
    // output so withShingles can be unpersisted HERE instead of leaking in
    // the shared bench/driver JVM — CacheManager holds persist() entries
    // strongly, so without this the shingle table is retained forever.
    // The loop's intermediate localCheckpoint blocks are unreferenced once
    // this returns and are reclaimed by the ContextCleaner on GC.
    val out = comp.join(sizes, "comp")
      .select(col("node").as("doc_id"), col("comp").as("cluster_id"),
        col("cluster_size"))
      .orderBy("doc_id")
      .localCheckpoint(true)
    withShingles.unpersist()
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_dup_clusters" -> (q45DupClusters _))

  def oracles: Map[String, String] = Map(
    "q45_dup_clusters" ->
      """WITH RECURSIVE
        |base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |variants AS (
        |  SELECT doc_id AS id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zz extra tail' FROM base
        |  UNION ALL
        |  SELECT doc_id + 200000, text || ' zz extra tail rr more pad'
        |  FROM base),
        |shs AS (
        |  SELECT id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(1, len(toks) - 1),
        |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    END) AS sh
        |  FROM (SELECT id, regexp_split_to_array(trim(text), '\s+') AS toks
        |        FROM variants)),
        |inv AS (
        |  SELECT DISTINCT * FROM (SELECT id, unnest(sh) AS s FROM shs)),
        |kept AS (SELECT s FROM inv GROUP BY s HAVING COUNT(*) <= 20),
        |cand AS (
        |  SELECT DISTINCT i1.id AS a, i2.id AS b
        |  FROM inv i1 JOIN kept USING (s) JOIN inv i2 USING (s)
        |  WHERE i1.id < i2.id),
        |edges AS (
        |  SELECT a, b
        |  FROM cand
        |  JOIN shs sa ON cand.a = sa.id
        |  JOIN shs sb ON cand.b = sb.id
        |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        |        / (len(sa.sh) + len(sb.sh)
        |           - len(list_intersect(sa.sh, sb.sh))) >= 0.7),
        |sym AS (
        |  SELECT a AS src, b AS dst FROM edges
        |  UNION
        |  SELECT b, a FROM edges),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM sym
        |  UNION
        |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
        |comp AS (
        |  SELECT src AS node, LEAST(src, MIN(dst)) AS cluster_id
        |  FROM reach GROUP BY src),
        |sizes AS (
        |  SELECT cluster_id, COUNT(*) AS n FROM comp GROUP BY cluster_id)
        |SELECT node AS doc_id, cluster_id, CAST(n AS BIGINT) AS cluster_size
        |FROM comp JOIN sizes USING (cluster_id)
        |ORDER BY doc_id""".stripMargin)
}
