package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic

/** Bridge for per-query-family SQLConf scoping.
  *
  * Spark has no per-plan conf: an `ObjectHashAggregateExec` reads its
  * sort-fallback threshold from whichever session executes the action.
  * To give ONE query family (the ANN top-k tail) a different threshold
  * than the rest of the engine, the family's frames are re-bound to a
  * CLONED session carrying the override — `cloneSession()` shares the
  * SparkContext, cache manager, and catalog but copies the SQLConf,
  * temp views, and registered functions, so the clone behaves
  * identically except for the overridden keys. Both entry points are
  * `private[sql]`, hence this shim inside the `org.apache.spark.sql`
  * package tree (same pattern as [[ColumnBridge]]). Only glue — all
  * engine logic stays under `graft.*`.
  */
object SessionBridge {

  /** Identical session with its own (copied) SQLConf. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Re-bind a frame's logical plan to `spark`: actions on the result
    * (and on frames derived from it) plan and execute under THAT
    * session's SQLConf. Logical plans are session-independent, so the
    * plan is reused as-is. */
  def bindTo(spark: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession],
      df.queryExecution.logical)
}
