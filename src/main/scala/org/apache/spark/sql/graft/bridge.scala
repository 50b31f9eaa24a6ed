package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column <-> Expression bridge `private[sql]`
  * (columnNodeSupport.scala); this shim re-exports the two conversions the
  * engine's Catalyst surface needs. Lives under org.apache.spark.sql.* for
  * access only — contains no logic. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Test-only accessor for the private[sql] rule-builder so the suite can
  * assert what a GraftExtensions injector wires up. */
object ExtensionsBridge {
  def optimizerRules(ext: org.apache.spark.sql.SparkSessionExtensions,
                     session: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(session)
}
