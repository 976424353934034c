package graft.plans

import org.apache.spark.sql.DataFrame

/** Eager `localCheckpoint(true)` with a plan-audit escape hatch: the
  * store-backed queries checkpoint their output so persisted inputs can
  * release (the q98 convention), but an eager checkpoint collapses the
  * physical plan to a `Scan ExistingRDD` — which makes the watched-plan
  * artifacts (`artifacts/explain_r*_watched.txt`) unreadable for exactly
  * the plans the audits most need. `graft.ExplainDump` flips `enabled`
  * off so it can print the REAL pre-checkpoint plan; every execution
  * path keeps the eager checkpoint. */
object Eager {
  @volatile private[graft] var enabled = true
  def ckpt(df: DataFrame): DataFrame =
    if (enabled) df.localCheckpoint(true) else df
}
