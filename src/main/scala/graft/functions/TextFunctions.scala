package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data-pipeline operators
  * (builder brief: dedup, language-ID, quality scoring, token counting,
  * fingerprinting). Everything here is built from codegen'd built-ins
  * (split/transform/aggregate/md5/conv) — no UDFs — so the expressions stay
  * inside whole-stage codegen and scale with the scan.
  */
object TextFunctions {

  /** Canonical form: trim, collapse internal whitespace, lowercase. */
  def normText(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** Whitespace tokenization with an explicit empty-string guard (split of
    * "" yields [""], which would count 1). */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Canonical-form document fingerprint (md5 of normalized text) — the
    * exact-dedup key and a cheap cross-system document identity. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Word n-gram shingles over a tokens array; documents shorter than n
    * collapse to a single whole-document shingle. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))

  /** md5-derived 60-bit hash: the first 15 hex digits of md5 parsed as an
    * unsigned integer. This is the base hash under MinHash and SimHash
    * because — unlike xxhash64 — it replays exactly in DuckDB as
    * `('0x' || substr(md5(s), 1, 15))::BIGINT` ([[md5Hash60Sql]]), which is
    * what makes q22/q27/q42 oracle-checkable. All-builtin (md5/conv are
    * codegen'd), value < 2^60 so it is a valid input to the mod-(2^61-1)
    * permutation family. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB spelling of [[md5Hash60]] applied to SQL expression `e`. */
  def md5Hash60Sql(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** MinHash signature: k universal-hash permutation minima over the
    * shingle set; element j = min over shingles of
    * `(a_j * md5Hash60(shingle) + b_j) mod (2^61-1)`. Two docs agree on
    * element j with probability ≈ their Jaccard similarity — the standard
    * MinHash estimator. Backed by the native codegen'd
    * [[org.apache.spark.sql.graft.MinHashMod61]]: one O(k·n) primitive pass
    * instead of k interpreted lambda sweeps, bit-equal to the DuckDB
    * HUGEINT replay (constants shared via
    * [[org.apache.spark.sql.graft.MinHashP61]]). */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.MinHashMod61(
        org.apache.spark.sql.graft.ColumnShim.expression(
          transform(shingleCol, s => md5Hash60(s))),
        k))

  /** LSH banding of a MinHash signature: `bands` buckets, each keyed by the
    * `rowsPerBand` consecutive signature elements joined into a string (a
    * replayable key — DuckDB concatenates the same decimal renderings).
    * Candidate pairs = docs sharing any (band index, band key) bucket — an
    * equi-join key, so near-dup candidate generation is a hash shuffle,
    * never an all-pairs product (the 100 TB requirement). */
  def minhashBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        concat_ws(",",
          transform(slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
            v => v.cast("string"))).as("band_hash")))

  /** Exact Jaccard similarity of two docs' distinct shingle sets —
    * the verification step after LSH candidate generation. */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    val inter = size(array_intersect(ad, bd)).cast("double")
    inter / (size(ad) + size(bd) - size(array_intersect(ad, bd)))
  }

  /** Per-token [[md5Hash60]] array — materialize this as its own column
    * before [[simhash]]: SQL lambdas cannot bind intermediates, so an
    * inlined version would re-hash every token 64× (measured ~2× of the
    * whole near-dup query). 60-bit hashes mean simhash bits 60-63 are
    * structurally zero (a majority over all-zero bits is zero), so the
    * DuckDB replay only sweeps bits 0-59. */
  def tokenHashes(toks: Column): Column = transform(toks, t => md5Hash60(t))

  /** 64-bit SimHash: bit b of the output is set iff a strict majority of
    * token hashes have bit b set. Near-identical documents land within a
    * small Hamming distance. Backed by the native codegen'd
    * [[org.apache.spark.sql.graft.SimHash64]]; [[simhashSpec]] is the SQL
    * HOF spelling of the same semantics (asserted bit-equal in tests). */
  def simhash(hashes: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.SimHash64(
        org.apache.spark.sql.graft.ColumnShim.expression(hashes)))

  /** Executable specification of [[simhash]] in pure SQL HOFs; input is the
    * NAME of a pre-computed [[tokenHashes]] column (the per-bit shift needs
    * the SQL form, and lambdas cannot bind intermediates). */
  def simhashSpec(hashesColName: String): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, 63), b ->
       |    case when 2 * size(filter($hashesColName,
       |                              h -> (shiftright(h, b) & 1) = 1))
       |              > size($hashesColName)
       |         then shiftleft(1L, b) else 0L end),
       |  0L, (acc, v) -> acc | v)""".stripMargin)

  /** SimHash chunking for near-dup candidate generation: split the 64-bit
    * hash into `chunks` equal bit-ranges. Pairs within Hamming distance
    * < chunks must share at least one chunk value (pigeonhole), so chunk
    * equality is a complete candidate filter — again an equi-join key.
    * Input is the NAME of the simhash column (the shift amount varies per
    * element, which the Scala shiftright signature can't express). */
  def simhashChunks(hColName: String, chunks: Int): Column = {
    val width = 64 / chunks
    val mask = (1L << width) - 1
    expr(
      s"""transform(sequence(0, ${chunks - 1}), c ->
         |  struct(c AS chunk,
         |         (shiftright($hColName, c * $width) & ${mask}L) AS chunk_val))"""
        .stripMargin)
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Jaro-Winkler similarity (native codegen'd
    * [[org.apache.spark.sql.graft.JaroWinkler]], DuckDB-compatible
    * semantics — see the expression's scaladoc). */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.JaroWinkler(
        org.apache.spark.sql.graft.ColumnShim.expression(a),
        org.apache.spark.sql.graft.ColumnShim.expression(b)))

  /** Overlapping character n-grams (native codegen'd
    * [[org.apache.spark.sql.graft.CharNGrams]]; the SQL HOF spelling is
    * the executable spec, asserted bit-equal in tests). */
  def charNgrams(c: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.CharNGrams(
        org.apache.spark.sql.graft.ColumnShim.expression(c), n))

  /** SQL HOF specification of [[charNgrams]]; input is a column NAME. */
  def charNgramsSpec(colName: String, n: Int): Column = expr(
    s"case when length($colName) < $n then array($colName) " +
      s"else transform(sequence(1, length($colName) - ${n - 1}), " +
      s"i -> substring($colName, i, $n)) end")
}
