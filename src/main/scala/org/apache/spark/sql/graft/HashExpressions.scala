// org.apache.spark.sql namespace: ExpectsInputTypes mentions the
// private[sql] AbstractDataType (see DotProductD).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Shared splitmix64 finalizer — the seed-mixing step of the native hash
  * expressions below. Public static so generated Java can call it. */
object HashMix {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** 64-bit SimHash over a pre-hashed token array (`array<long>` from
  * TextFunctions.tokenHashes, md5-derived 60-bit values): output bit b is
  * set iff a strict majority of input hashes have bit b set.
  *
  * Bit-for-bit equal to the SQL HOF spelling (kept as the executable spec in
  * TextFunctions and asserted equal in tests), but the HOF form pays
  * interpreted-lambda dispatch on every one of the 64×n filter probes; this
  * generates one two-level primitive loop with 64 counters on the stack.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (2 * counts(b) > n) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $x.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if (2 * $counts[$b] > $n) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Fixed parameters of the mod-(2^61-1) universal-hash MinHash family.
  *
  * Permutation j is `h -> (a(j)*h + b(j)) mod P` with P = 2^61-1 (Mersenne),
  * over md5-derived base hashes < 2^60. The point of this family (vs the
  * earlier splitmix64 re-seeding) is cross-engine replayability: the exact
  * same permutation is one line of DuckDB HUGEINT arithmetic
  * (`(h * a + b) % P`), so MinHash signatures — and everything downstream of
  * them — are oracle-checkable. Constants are deterministic (splitmix64
  * stream), shared between the native expression and the generated oracle
  * SQL, which embeds them as literals.
  */
object MinHashP61 {
  /** 2^61 - 1, prime. */
  val P: Long = (1L << 61) - 1
  val MaxK = 64

  private def draw(i: Int): Long = HashMix.mix(0x9e2f5eedL + i) & Long.MaxValue

  /** Multipliers in [1, P-1]. */
  val A: Array[Long] = Array.tabulate(MaxK)(j => 1L + draw(2 * j) % (P - 1))
  /** Offsets in [0, P-1]. */
  val B: Array[Long] = Array.tabulate(MaxK)(j => draw(2 * j + 1) % P)

  def a(j: Int): Long = A(j)
  def b(j: Int): Long = B(j)

  /** `(a*h + b) mod P` exactly, for 0 <= h < 2^61, via 128-bit decomposition
    * and Mersenne folding (2^61 ≡ 1 mod P). Public static so generated Java
    * can call it; bit-equal to DuckDB's `(h * a::HUGEINT + b) % P`. */
  def permute(a: Long, b: Long, h: Long): Long = {
    val hi = Math.multiplyHigh(a, h)
    val lo = a * h
    var s = (lo & P) + (((lo >>> 61) | (hi << 3)) & P) + (hi >>> 58)
    s = (s & P) + (s >>> 61)
    if (s >= P) s -= P
    s += b
    if (s >= P) s -= P
    s
  }
}

/** MinHash signature from a pre-hashed shingle array (md5-derived 60-bit
  * values): element j of the k-element output is
  * `min over h of (a_j*h + b_j) mod (2^61-1)` — k universal-hash permutation
  * minima in one O(k·n) primitive pass, no per-seed lambda re-evaluation.
  * The permutation family ([[MinHashP61]]) is chosen to be exactly
  * replayable in DuckDB SQL, making the signature oracle-checkable.
  */
case class MinHashMod61(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1 && k <= MinHashP61.MaxK, s"k must be in [1, ${MinHashP61.MaxK}]")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_mod61"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val aj = MinHashP61.a(j)
      val bj = MinHashP61.b(j)
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = MinHashP61.permute(aj, bj, hs.getLong(i))
        if (v < best) best = v
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val aj = ctx.freshName("aj")
      val bj = ctx.freshName("bj")
      val best = ctx.freshName("best")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val fam = "org.apache.spark.sql.graft.MinHashP61"
      s"""
         |int $n = $x.numElements();
         |long[] $out = new long[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  long $aj = $fam.a($j);
         |  long $bj = $fam.b($j);
         |  long $best = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = $fam.permute($aj, $bj, $x.getLong($i));
         |    if ($v < $best) $best = $v;
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashMod61 =
    copy(child = newChild)
}
