// org.apache.spark.sql namespace: ExpectsInputTypes mentions the
// private[sql] AbstractDataType (see DotProductD).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

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
  * `transform(toks, t -> xxhash64(t))`): output bit b is set iff a strict
  * majority of input hashes have bit b set.
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

/** MinHash signature from a pre-hashed shingle array: element i of the
  * k-element output is `min over h of splitmix64(h ^ mix(i))` — k seeded
  * permutation minima derived from one base hash per shingle (the
  * Kirsch–Mitzenmacher-style re-seeding), one O(k·n) primitive pass,
  * no per-seed lambda re-evaluation.
  */
case class MinHashSignature64(child: Expression, k: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = child
  override def right: Expression = k
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature64"

  override def foldable: Boolean = child.foldable && k.foldable

  override protected def nullSafeEval(input: Any, kVal: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val kk = kVal.asInstanceOf[Int]
    val n = hs.numElements()
    val out = new Array[Long](kk)
    var j = 0
    while (j < kk) {
      val seed = HashMix.mix(j.toLong)
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = HashMix.mix(hs.getLong(i) ^ seed)
        if (v < best) best = v
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, kv) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val seed = ctx.freshName("seed")
      val best = ctx.freshName("best")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val mixer = "org.apache.spark.sql.graft.HashMix"
      s"""
         |int $n = $x.numElements();
         |long[] $out = new long[$kv];
         |for (int $j = 0; $j < $kv; $j++) {
         |  long $seed = $mixer.mix((long) $j);
         |  long $best = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = $mixer.mix($x.getLong($i) ^ $seed);
         |    if ($v < $best) $best = $v;
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSignature64 =
    copy(child = newLeft, k = newRight)
}
