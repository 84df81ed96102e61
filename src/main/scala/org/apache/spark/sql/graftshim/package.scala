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
}
