package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ catalyst Expression bridge. Spark 4 made the converters
  * (`classic.ExpressionUtils`) private[sql]; custom expression libraries
  * conventionally expose them from a file compiled into the
  * `org.apache.spark.sql` package. No Spark internals are modified.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply an extensions object's injected functions to a registry
    * (what session build does internally; used by tests).
    */
  def registerFunctions(
      ext: SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)

  /** Materialize an extensions object's injected optimizer rules for a
    * session (what session build does internally; used by tests).
    */
  def buildOptimizerRules(ext: SparkSessionExtensions, session: SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(session)
}
