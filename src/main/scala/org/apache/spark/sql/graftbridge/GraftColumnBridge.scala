package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) so graft's custom
  * Catalyst expressions can surface through the public Column API —
  * the standard extension-library pattern for Spark 4's column-node
  * refactor. Nothing else from the private surface is touched. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test-only: materialize the optimizer rules an extensions
    * installer registered (`buildOptimizerRules` is `private[sql]`),
    * so the `spark.sql.extensions=` registration path is assertable
    * without tearing down the shared test SparkContext. */
  def optimizerRules(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      s: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(s)

  /** Register a SQL function on an ALREADY-BUILT session — the
    * `sessionState.functionRegistry` handle is `private[sql]`, so the
    * runtime half of [[graft.functions.GraftFunctions]]'s registration
    * (the config half, `spark.sql.extensions`, needs no bridge) goes
    * through here. Same per-session semantics as the built-ins: the
    * registry is session-state, so a `newSession()` starts from the
    * parent's cloned registry and later registrations don't leak
    * across sessions. */
  def registerFunction(s: org.apache.spark.sql.SparkSession,
                       name: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
