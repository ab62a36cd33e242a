package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for custom Catalyst expressions. Spark 4
  * made Column opaque and its converters private[sql]; extension
  * libraries ship exactly this shim (cf. Sedona, spark-nlp). Only the
  * two converters are exposed — nothing else reaches into internals.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
