package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * higher-order functions (zip_with/aggregate) — codegen-friendly, no UDFs.
  *
  * Numeric-parity convention: elements are cast float→double (exact), the
  * product of two such doubles is IEEE-exact per element, and `aggregate`
  * folds left sequentially — so a DuckDB oracle that spells the same
  * left-associated sum gets bit-identical doubles (same trick as the
  * decimal-money convention in [[graft.queries.Kpis]]).
  */
object VectorFunctions {

  /** Dot product as a sequential left fold: ((0 + x1·y1) + x2·y2) + …
    * Backed by the native codegen'd [[org.apache.spark.sql.graft.DotProductD]];
    * bit-identical to [[dotHof]] (asserted in DocOpsSpec) but ~100× faster
    * in interpreted-HOF-dominated scans. */
  def dotD(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.DotProductD(
        org.apache.spark.sql.graft.ColumnShim.expression(a),
        org.apache.spark.sql.graft.ColumnShim.expression(b)))

  /** The same fold spelled with built-in higher-order functions — kept as
    * the executable specification of [[dotD]]'s semantics. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm2(a: Column): Column = dotD(a, a)

  /** INTEGER dot product over `array<bigint>` vectors — the int64 twin of
    * [[dotD]], backed by the native codegen'd
    * [[org.apache.spark.sql.graft.DotProductL]]. Bit-identical to
    * [[dotLHof]] (int64 adds are exact and order-free; asserted in
    * IntVecExprSpec) but stays inside whole-stage codegen instead of
    * paying interpreted-lambda dispatch per element — the round-17 fix
    * for the retrieval-index family's brute-force certificate sides,
    * which evaluate this dot over millions of (query, chunk) pairs. */
  def dotL(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.DotProductL(
        org.apache.spark.sql.graft.ColumnShim.expression(a),
        org.apache.spark.sql.graft.ColumnShim.expression(b)))

  /** The same int64 fold spelled with built-in higher-order functions —
    * kept as the executable specification of [[dotL]]'s semantics. */
  def dotLHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Exact integer squared L2 norm of an `array<bigint>` vector:
    * `dotL(v, v)` — bit-identical to the left fold
    * `aggregate(v, 0L, (a, x) -> a + x*x)`. */
  def norm2L(v: Column): Column = dotL(v, v)

  /** Feature-hash histogram (hashing trick) over a pre-hashed token array:
    * d-length signed-count `array<bigint>`, dimension = hash mod d, sign
    * from hash bit 5. Backed by the native codegen'd
    * [[org.apache.spark.sql.graft.FeatureHashVecL]]; bit-identical to the
    * HOF fold spelling kept as [[featureHashVecHof]] (asserted in
    * IntVecExprSpec) but one O(n) primitive pass instead of O(n·d)
    * interpreted lambda steps with a d-length array allocation per
    * token. */
  def featureHashVec(hashes: Column, d: Int): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.FeatureHashVecL(
        org.apache.spark.sql.graft.ColumnShim.expression(hashes), d))

  /** Executable HOF specification of [[featureHashVec]]. */
  def featureHashVecHof(hashes: Column, d: Int): Column = {
    val enc = transform(hashes, h =>
      struct((h % d).cast("int").as("d"),
        when(shiftright(h, 5).bitwiseAND(lit(1L)) === lit(0L), lit(1L))
          .otherwise(lit(-1L)).as("s")))
    aggregate(enc, array_repeat(lit(0L), d),
      (acc, e) => transform(acc, (v, i) =>
        v + when(e.getField("d") === i, e.getField("s")).otherwise(lit(0L))))
  }

  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** The DuckDB-side unrolled twin of [[dotD]] for `dim`-element vectors:
    * explicit left-associated 1-based-index sum, bit-exact vs the fold. */
  def dotSqlUnrolled(a: String, b: String, dim: Int): String =
    (1 to dim)
      .map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")

  /** The DuckDB-side twin of `dotD(v, typedLit(plane))`: the same
    * left-associated fold, with the plane components emitted as double
    * LITERALS (Java's shortest-round-trip decimal repr, which DuckDB's
    * correctly-rounded parser maps back to the identical double) — so the
    * per-element product and the running sum are bit-identical IEEE ops on
    * both engines. */
  def dotSqlPlaneLit(a: String, plane: Array[Double]): String =
    plane.zipWithIndex
      .map { case (p, i) => s"CAST($a[${i + 1}] AS DOUBLE)*($p)" }
      .mkString(" + ")

  /** The DuckDB-side twin of [[lshSignature]]: per-plane sign bit from the
    * replayed literal dot product, packed by integer addition. Lets an
    * oracle reproduce the exact LSH bucketing — the hyperplanes are
    * plan-time constants, so they are just more literals in the SQL. */
  def sigSqlLit(a: String, planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN (${dotSqlPlaneLit(a, p)}) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** Deterministic pseudo-random unit-free hyperplanes for sign-LSH over
    * cosine similarity: components from a fixed-seed 64-bit LCG mapped into
    * [-1, 1]. Pure Scala (plan-time) — the planes become literals in the
    * plan, identical on every run and every executor. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      // top 53 bits → [0,1) → [-1,1)
      (s >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Array.fill(nPlanes, dim)(next())
  }

  /** Sign-LSH signature: bit j = (v · plane_j) > 0, packed into a long.
    * Vectors with high cosine similarity agree on most sign bits, so equal
    * signatures (or equal signature bands) are an equi-join candidate key —
    * the scale path that replaces the O(N²) all-pairs cosine. */
  def lshSignature(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dotD(v, typedLit(p)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Per-vector symmetric int8 quantization: scale = max|x|/127, elements
    * round to [-127, 127]. 4× storage reduction for embedding columns — at
    * 100 TB the difference between shuffling floats and shuffling bytes in
    * every similarity stage; cosine on dequantized vectors is within ~1%
    * of exact (asserted in tests). All built-ins, codegen-friendly. */
  def quantizeScale(v: Column): Column =
    greatest(array_max(transform(v, x => abs(x))), lit(1e-12f)).cast("double") / 127.0

  def quantize8(v: Column, scale: Column): Column =
    transform(v, x => round(x.cast("double") / scale).cast("byte"))

  def dequantize8(q: Column, scale: Column): Column =
    transform(q, x => (x.cast("double") * scale).cast("float"))

  /** Sign-LSH band width (bits per band) that scales with corpus size:
    * w = max(8, ceil(log2(n/16))), capped at 28. Expected random-pair
    * collisions per band are n²/2^w ≈ 16·n — LINEAR in the corpus — so
    * the banded candidate self-join stops being the quadratic term a
    * FIXED width is (measured 62–72× shuffle at 10× clones with w=8,
    * SCALE_NOTES_r12; the r12 calibration table q281 is the
    * precision/recall evidence for the operating point). At every
    * fixture scale (≤4096 vectors) the floor keeps w = 8 — exactly the
    * 16-bit/2-band point the DuckDB oracles replay as literals — the
    * same pin-at-fixture discipline as SemanticCells.adaptiveK. */
  def adaptiveBandBits(n: Long): Int = {
    val buckets = math.max(1L, n / 16L)
    val ceilLog2 =
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, buckets - 1L))
    math.min(28, math.max(8, ceilLog2))
  }

  /** Band an LSH signature into `bands` chunk values (same pigeonhole
    * rationale as SimHash chunking). */
  def lshBands(sigColName: String, nBits: Int, bands: Int): Column = {
    val width = nBits / bands
    val mask = (1L << width) - 1
    expr(
      s"""transform(sequence(0, ${bands - 1}), c ->
         |  struct(c AS band,
         |         (shiftright($sigColName, c * $width) & ${mask}L) AS band_val))"""
        .stripMargin)
  }
}
