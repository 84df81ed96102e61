package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark internals: Spark 4 `Column`s are
  * ColumnNode-backed, and the node→Expression converter lives behind
  * `private[sql]`. Pruning (graft.engine.StatsPruning) works on Catalyst
  * expression trees, so it needs this one accessor. Nothing else in the
  * library reaches into Spark internals.
  */
package object graftshim {
  def expressionOf(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Catalyst Expression -> Column (for SQL-DML conditions handed to
    * the engine API).
    */
  def columnOf(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** LogicalPlan -> DataFrame (Dataset.ofRows is private[sql]). */
  def dfFromPlan(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Batch DataFrame -> streaming-marked DataFrame. DSv1 streaming
    * Sources must return micro-batches whose plan has isStreaming=true
    * (MicroBatchExecution asserts it); Spark's own FileStreamSource
    * does exactly this via internalCreateDataFrame, which is
    * private[sql].
    */
  def streamingDfFromBatch(spark: SparkSession, df: DataFrame): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
        isStreaming = true)
}
