// Lives in the org.apache.spark.sql namespace because ExpectsInputTypes'
// signature mentions the private[sql] AbstractDataType (see DotProductD).
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler scoring kernel. Top-level object so the compiler emits a
  * static forwarder — generated Java (doGenCode below) calls
  * `org.apache.spark.sql.graft.JaroWinklerImpl.jw(a, b)` directly, the
  * same pattern as Spark's own `UTF8String.levenshteinDistance`.
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (the oracle),
  * fuzz-verified bit-identical over 7,000 random string pairs
  * (Round12hSpec carries the canonical examples):
  *   - match window = max(|a|,|b|)/2 − 1 (floor, min 0), greedy
  *     first-unclaimed matching, transpositions = ⌊out-of-order/2⌋;
  *   - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, evaluated in exactly that
  *     double order (the chain both engines share);
  *   - Winkler boost ONLY when jaro > 0.7: j + 0.1·ℓ·(1−j) with ℓ the
  *     common prefix capped at 4;
  *   - any empty side → 0.0 (DuckDB also scores ``''`` vs ``''`` as 0,
  *     unlike the classic convention of 1).
  *
  * Comparison is by UTF-16 code unit (String chars) — identical to
  * codepoint comparison for the BMP text this library scores. */
object JaroWinklerImpl {
  def jw(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2, i + win + 1)
      var j = math.max(0, i - win)
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var tRaw = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) tRaw += 1
        k += 1
      }
      i += 1
    }
    val t = tRaw / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val cap = math.min(4, math.min(l1, l2))
      while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + 0.1 * l * (1.0 - jaro)
    } else jaro
  }
}

/** Native Catalyst expression: Jaro-Winkler similarity of two string
  * columns, DuckDB-compatible (see [[JaroWinklerImpl]]). The record-linkage
  * scorer the ER family's edit-distance tools (levenshtein q81, SymSpell
  * q88) don't cover: JW weighs shared prefixes and tolerates
  * transpositions, the error shapes of human-keyed names. Registered
  * SQL-side as `jaro_winkler` via graft.plans.GraftExtensions; codegen is
  * one static call, so it stays inside whole-stage codegen. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.JaroWinklerImpl.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
