package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column↔Expression converters (Spark 4
  * moved Column onto ColumnNode; libraries adding native Catalyst
  * expressions need this shim — the widely used extension-library
  * pattern).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over a custom LogicalPlan (sql-private Dataset.ofRows) —
    * needed to surface library-defined plan nodes like
    * graft.plans.MentionScanPlan as ordinary DataFrames.
    */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a Dataset (sql-private accessor). */
  def logicalPlan(ds: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    ds.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
