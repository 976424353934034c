// org.apache.spark.sql namespace: keeps the native-expression family
// together (see DotProductD for the rationale).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping character n-grams of a string as `array<string>`; strings
  * shorter than n collapse to a single whole-string gram (mirroring the
  * word-shingle convention in TextFunctions.shingles).
  *
  * Bit-identical to the SQL HOF spelling
  * `transform(sequence(1, length(s)-n+1), i -> substring(s, i, n))`
  * (asserted in tests), but that form pays interpreted-lambda dispatch per
  * gram — ~3M dispatches for the 5k-doc corpus, the dominant cost of the
  * language-ID query. This is one static call per row inside codegen.
  */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, "n must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    CharNGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = org.apache.spark.sql.graft.CharNGrams.compute($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {
  /** Static so generated Java calls it directly. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) new GenericArrayData(Array[Any](s))
    else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        out(i) = s.substring(i, i + n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
