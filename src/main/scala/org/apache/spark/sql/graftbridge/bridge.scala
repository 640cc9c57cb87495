package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` column/expression/plan conversions
  * (Spark 4 wraps Columns in ColumnNodes; this is the
  * supported-internal path between the public DSL and custom Catalyst
  * expressions / logical plans). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].logicalPlan

  /** Drain the shared listener bus — QueryExecutionListener events
    * post asynchronously, so an audit that collects the EAGER
    * sub-executions fired during a query build (localCheckpoint,
    * persist-materializing counts, warehouse writes) must flush
    * before reading them. `listenerBus` is `private[spark]`; this
    * bridge is the supported-internal path to it. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
