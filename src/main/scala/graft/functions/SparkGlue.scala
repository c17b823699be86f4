/* Lives in a subpackage of org.apache.spark.sql purely to reach the
 * private[sql] Column <-> catalyst Expression converters — the supported
 * way to expose custom Catalyst expressions as user-facing Columns without
 * registering a whole FunctionRegistry extension. */
package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Glue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Re-exports of types that went private[sql] in Spark 4. */
object GlueTypes {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
