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
      case l: org.apache.spark.sql.execution.LogicalRDD => releaseRdd(l.rdd)
      case _ => ()
    }

  /** Unpersist ANY persistent RDD under the same scoped mute — for
    * between-query sweepers (Bench) that drop leftover
    * `localCheckpoint(eager=true)` blocks a query deliberately left
    * behind for its consumer (e.g. a result frame checkpointed so a gate
    * aggregation and the output dump share one materialization). The
    * drop is intentional cleanup, so the WARN is noise there exactly as
    * it is in [[releaseCheckpoint]]. */
  /** Flush the async listener bus so a caller counting job events (the
    * one-job `describe` spec) reads a complete count —
    * `SparkContext.listenerBus` is `private[spark]`, reachable only
    * through this bridge. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  def releaseRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    // Spark WARNs ("locally checkpointed ... cannot be recomputed after
    // unpersisting") on every such unpersist via the concrete RDD
    // class's logger (synchronously, before the async block drop). The
    // release is deliberate — the frame is dead by contract — so mute
    // that logger ONLY for the duration of the call and restore its
    // prior state after: the class (MapPartitionsRDD) backs nearly all
    // RDDs, so a permanent mute would swallow unrelated legitimate
    // WARNs for the rest of the JVM.
    val name = rdd.getClass.getName
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val conf = ctx.getConfiguration
    val hadExplicit = conf.getLoggerConfig(name).getName == name
    val prior =
      if (hadExplicit) conf.getLoggerConfig(name).getLevel else null
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      name, org.apache.logging.log4j.Level.ERROR)
    try rdd.unpersist(blocking = false)
    finally {
      if (hadExplicit)
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          name, prior)
      else { conf.removeLogger(name); ctx.updateLoggers() }
    }
  }
}
