package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graft.{CharNGrams, DotProductD, DotProductL, DtwCentsL, FeatureHashVecL, FfdPackL, JaroWinkler, MinHashMod61, SimHash64, SortableBitsToDouble, SortableDoubleBits}

/** Session extensions registering graft's native expressions with the SQL
  * function registry, so `spark.sql("SELECT dot_product_d(a, b) …")` works
  * next to the DataFrame API. Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product_d"),
      new ExpressionInfo(classOf[DotProductD].getName, "dot_product_d"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product_d takes exactly 2 arguments")
        DotProductD(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product_l"),
      new ExpressionInfo(classOf[DotProductL].getName, "dot_product_l"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product_l takes exactly 2 arguments")
        DotProductL(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("feature_hash_vec_l"),
      new ExpressionInfo(classOf[FeatureHashVecL].getName, "feature_hash_vec_l"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "feature_hash_vec_l takes (array<long>, d)")
        val d = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"feature_hash_vec_l d must be an integer literal, got $other")
        }
        FeatureHashVecL(children.head, d)
      }))
    ext.injectFunction((
      new FunctionIdentifier("ffd_pack_l"),
      new ExpressionInfo(classOf[FfdPackL].getName, "ffd_pack_l"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "ffd_pack_l takes (array<long>, cap)")
        FfdPackL(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dtw_cents_l"),
      new ExpressionInfo(classOf[DtwCentsL].getName, "dtw_cents_l"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dtw_cents_l takes exactly 2 arguments")
        DtwCentsL(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sortable_double_bits"),
      new ExpressionInfo(classOf[SortableDoubleBits].getName,
        "sortable_double_bits"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "sortable_double_bits takes 1 argument")
        SortableDoubleBits(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("sortable_bits_to_double"),
      new ExpressionInfo(classOf[SortableBitsToDouble].getName,
        "sortable_bits_to_double"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "sortable_bits_to_double takes 1 argument")
        SortableBitsToDouble(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "jaro_winkler takes exactly 2 arguments")
        JaroWinkler(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash64 takes exactly 1 argument")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNGrams].getName, "char_ngrams"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "char_ngrams takes (string, n)")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"char_ngrams n must be an integer literal, got $other")
        }
        CharNGrams(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_mod61"),
      new ExpressionInfo(classOf[MinHashMod61].getName, "minhash_mod61"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash_mod61 takes (array<long>, k)")
        val k = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_mod61 k must be an integer literal, got $other")
        }
        MinHashMod61(children.head, k)
      }))
  }
}
