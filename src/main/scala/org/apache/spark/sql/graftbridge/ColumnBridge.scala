package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge to the `private[sql]` Column <-> catalyst Expression
  * converters. The engine builds a handful of plan-level constructs the
  * public DataFrame API cannot express (an explicit
  * BloomFilterAggregate scalar subquery, for one); this is the single
  * sanctioned crossing point, kept deliberately tiny so the
  * internal-API surface the engine depends on stays auditable.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
