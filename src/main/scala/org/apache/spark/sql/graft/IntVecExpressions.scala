// org.apache.spark.sql namespace: ExpectsInputTypes mentions the
// private[sql] AbstractDataType (see DotProductD).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native INTEGER dot product of two `array<bigint>` columns — the int64
  * twin of [[DotProductD]] (round-17 optimization: the retrieval-index
  * family q441-q457 scores feature-hash INTEGER vectors, and its
  * brute-force certificate sides evaluate the dot over millions of
  * (query, chunk) pairs).
  *
  * Bit-identical to the HOF spelling
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)`
  * (kept as the executable spec in the round-17 perf suite): int64
  * addition is exact and order-free, mismatched lengths yield NULL
  * (zip_with null-pads, the product nulls, the running sum sticks at
  * NULL), and any NULL element nulls the result the same way. The HOF
  * form evaluates interpreted (lambda dispatch + one intermediate array
  * allocation per row); this generates a tight primitive loop inside
  * whole-stage codegen.
  */
case class DotProductL(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  // Always nullable: mismatched dimensions or a NULL element yield NULL
  // even when both child arrays are non-null (the HOF-spec convention).
  override def nullable: Boolean = true

  override def prettyName: String = "dot_product_l"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getLong($i) * $y.getLong($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductL =
    copy(left = newLeft, right = newRight)
}

/** Feature-hash histogram (the hashing trick, Weinberger et al. 2009) over
  * a pre-hashed token array: output element `i` of the `d`-length
  * `array<bigint>` is the signed count of hashes with `h % d == i`, the
  * sign taken from hash bit 5 (`(h >> 5) & 1 == 0` → +1, else −1).
  *
  * Bit-identical to the retrieval family's HOF spelling
  * {{{
  *   aggregate(
  *     transform(hashes, h -> struct(cast(h % d as int) AS d,
  *                                   if(((h >> 5) & 1) = 0, 1L, -1L) AS s)),
  *     array_repeat(0L, d),
  *     (acc, e) -> transform(acc, (v, i) -> v + if(e.d = i, e.s, 0L)))
  * }}}
  * (int64 histogram adds commute; a NULL hash contributes 0 on both
  * spellings — `e.d = i` is never true for a NULL dim; a negative hash —
  * impossible for the md5-60 grid, but part of the spec — likewise hits
  * no bucket because the Java remainder is negative). The HOF form pays
  * O(n·d) interpreted lambda steps and allocates one d-length array per
  * token; this is one O(n) primitive pass with a single output array.
  */
case class FeatureHashVecL(child: Expression, d: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(d > 0, s"d must be positive: $d")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "feature_hash_vec_l"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](d)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        val dim = (h % d).toInt
        if (dim >= 0) out(dim) += (if (((h >> 5) & 1L) == 0L) 1L else -1L)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val dim = ctx.freshName("dim")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |long[] $out = new long[$d];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    long $h = $x.getLong($i);
         |    int $dim = (int) ($h % $d);
         |    if ($dim >= 0) $out[$dim] += ((($h >> 5) & 1L) == 0L) ? 1L : -1L;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FeatureHashVecL =
    copy(child = newChild)
}

/** First-fit-decreasing bin packing over a (descending-sorted) size array
  * — the native twin of q359's relational FFD fold. Returns the bin-load
  * array after placing every size: each size goes into the FIRST bin
  * whose load + size ≤ cap, or opens a new bin.
  *
  * Bit-identical to the HOF spelling (the q359 `aggregate` CASE fold) on
  * every input it accepts, including the degenerate ones: a NULL size
  * never "fits" (the fit predicate is NULL → filtered out) and is
  * APPENDED as a NULL bin, which thereafter never accepts another size —
  * exactly the HOF's behaviour. The HOF form rebuilds the whole bin array
  * per placed size (O(files × bins) interpreted lambda steps with one
  * array allocation each — measured as the entirety of q359's 14 s); this
  * is one in-place O(files × bins) primitive pass. Runs on ONE census row
  * — evaluated, not codegen'd (CodegenFallback), because per-row dispatch
  * cost is irrelevant at that cardinality.
  */
case class FfdPackL(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), LongType)

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "ffd_pack_l"

  override protected def nullSafeEval(sizesAny: Any, capAny: Any): Any = {
    val sizes = sizesAny.asInstanceOf[ArrayData]
    val cap = capAny.asInstanceOf[Long]
    val n = sizes.numElements()
    val bins = new java.util.ArrayList[java.lang.Long](64)
    var i = 0
    while (i < n) {
      val xNull = sizes.isNullAt(i)
      val x = if (xNull) 0L else sizes.getLong(i)
      var placed = false
      if (!xNull) {
        var j = 0
        while (!placed && j < bins.size()) {
          val b = bins.get(j)
          if (b != null && b.longValue() + x <= cap) {
            bins.set(j, java.lang.Long.valueOf(b.longValue() + x))
            placed = true
          }
          j += 1
        }
      }
      if (!placed) bins.add(if (xNull) null else java.lang.Long.valueOf(x))
      i += 1
    }
    val out = new Array[Any](bins.size())
    var j = 0
    while (j < bins.size()) {
      out(j) = if (bins.get(j) == null) null else bins.get(j).longValue()
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FfdPackL =
    copy(left = newLeft, right = newRight)
}

/** Dynamic-time-warping distance between two integer series with |x − y|
  * step cost — the native twin of q354's relational DTW fold. Standard
  * DP over the (|va| × |vb|) grid; returns the bottom-right cumulative
  * cost.
  *
  * Bit-identical to the HOF spelling (q354's nested `aggregate`) on the
  * non-null, non-empty series the census produces: the init row is the
  * cumulative |va(0) − vb(j)| prefix, each subsequent row folds
  * `|x − y| + min(diag, up, left)`, and all arithmetic is exact int64.
  * NULL/empty inputs return NULL (the census never emits them; pinned in
  * the perf spec). The HOF form is O(m·n) interpreted lambda steps with
  * one array CONCAT per cell (quadratic allocation per row — measured as
  * the entirety of q354's 8.9 s over 300 nation pairs); this is one
  * primitive O(m·n) pass over two scratch rows. Evaluated, not codegen'd
  * (CodegenFallback): it runs on ≤ |nations|² census rows.
  */
case class DtwCentsL(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "dtw_cents_l"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[ArrayData]
    val vb = b.asInstanceOf[ArrayData]
    val m = va.numElements()
    val n = vb.numElements()
    if (m == 0 || n == 0) return null
    var i = 0
    while (i < m) { if (va.isNullAt(i)) return null; i += 1 }
    var j = 0
    while (j < n) { if (vb.isNullAt(j)) return null; j += 1 }
    // init row: cumulative |va(0) - vb(j)|
    var prev = new Array[Long](n)
    val x0 = va.getLong(0)
    var s = 0L
    j = 0
    while (j < n) {
      s += math.abs(x0 - vb.getLong(j))
      prev(j) = s
      j += 1
    }
    var cur = new Array[Long](n)
    i = 1
    while (i < m) {
      val x = va.getLong(i)
      cur(0) = math.abs(x - vb.getLong(0)) + prev(0)
      j = 1
      while (j < n) {
        val best = math.min(prev(j), math.min(prev(j - 1), cur(j - 1)))
        cur(j) = math.abs(x - vb.getLong(j)) + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n - 1)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DtwCentsL =
    copy(left = newLeft, right = newRight)
}

/** Order-isomorphic IEEE-754 encoding of a double as a signed long:
  * `d1 < d2  ⟺  sortableDoubleBits(d1) < sortableDoubleBits(d2)` over all
  * non-NaN doubles (with −0.0 ordered just below +0.0 — callers must not
  * feed −0.0/NaN where that matters; the retrieval cosines cannot produce
  * either: denominators are strictly positive and a zero dot divides to
  * +0.0). The map is the classic bit trick — non-negative doubles keep
  * their raw bits (already ascending), negative doubles flip the
  * 63 value bits so "more negative" sorts lower — and it is a BIJECTION,
  * so [[SortableBitsToDouble]] recovers the exact input double. Purpose
  * (r17): lets the per-group top-k-by-cosine windows ride the bounded
  * [[TopKLongPairs]] aggregate (long keys by design) instead of a full
  * shuffle+sort of every scored row.
  */
case class SortableDoubleBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "sortable_double_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToRawLongBits(input.asInstanceOf[Double])
    if (b >= 0L) b else b ^ 0x7fffffffffffffffL
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.freshName("b")
      s"""
         |long $b = Double.doubleToRawLongBits($x);
         |${ev.value} = ($b >= 0L) ? $b : ($b ^ 0x7fffffffffffffffL);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SortableDoubleBits =
    copy(child = newChild)
}

/** Exact inverse of [[SortableDoubleBits]] (xor with the 63 value bits is
  * an involution), recovering the bit-identical original double. */
case class SortableBitsToDouble(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "sortable_bits_to_double"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Long]
    java.lang.Double.longBitsToDouble(
      if (v >= 0L) v else v ^ 0x7fffffffffffffffL)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val b = ctx.freshName("b")
      s"""
         |long $b = ($x >= 0L) ? $x : ($x ^ 0x7fffffffffffffffL);
         |${ev.value} = Double.longBitsToDouble($b);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SortableBitsToDouble =
    copy(child = newChild)
}
