package graft.functions

import org.apache.spark.sql.DataFrame

/** Working-column hygiene for operators that add helper columns to
  * CALLER-supplied frames: a hardcoded name (`_salt`, `_bin`, `_t`…)
  * silently replaces — and later drops — data the caller owns if their
  * frame already carries that name. */
object Cols {

  /** First name in `base`, `base1`, `base2`, … that collides with no
    * column of any input frame. */
  def fresh(base: String, dfs: DataFrame*): String = {
    val taken = dfs.flatMap(_.columns).toSet
    Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(!taken(_)).get
  }
}
