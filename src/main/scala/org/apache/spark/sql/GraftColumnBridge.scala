package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column ↔ Expression converters for
  * graft's native Catalyst expressions that carry non-literal model
  * state (e.g. [[graft.functions.IvfCells]], whose codebook arrays
  * cannot ride the function-registry path the way a two-argument
  * scalar like cosine_sim can). Lives in `org.apache.spark.sql` only
  * to satisfy `private[sql]`; no Spark internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** A DataFrame over an analyzer-produced logical plan — the SQL
    * MERGE front door ([[graft.plans.LakeDml]]) captures the
    * statement's already-resolved USING source plan and re-opens it
    * as a relation at command run time. `Dataset.ofRows` is
    * `private[sql]`, hence the bridge.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
