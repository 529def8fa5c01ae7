package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-placed bridge exposing Spark's private[sql] Column↔Expression
  * converters to graft's native expressions (graft.expressions.*). The
  * alternative — registering every function in every session — would
  * make library Columns unusable in sessions the caller configures
  * without GraftExtensions. This is the only spot where graft reaches
  * into Spark's package namespace, kept to two one-line delegations.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
