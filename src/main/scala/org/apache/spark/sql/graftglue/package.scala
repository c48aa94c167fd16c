package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column/Expression seam.
  * Spark 4 wraps Column around ColumnNode and hides the Expression
  * constructor; custom Catalyst expressions (graft.functions.*Expr) need
  * exactly one call: wrap an Expression as a user-facing Column. Living in
  * a subpackage of org.apache.spark.sql grants `private[sql]` access —
  * the standard pattern for Catalyst-level extension libraries. */
object GraftGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Release the block-manager storage behind a `localCheckpoint(eager=true)`
    * Dataset. A checkpointed Dataset's plan is a [[LogicalRDD]] wrapping the
    * persisted internal RDD; `Dataset.unpersist` cannot reach it (it is not
    * in the cache manager), so iterative operators that checkpoint per round
    * would otherwise leak one round's blocks per iteration for the life of
    * the session. No-op on non-checkpointed frames. */
  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
