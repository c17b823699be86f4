package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.SparkSession

/** Accessor for the `private[sql]` session state needed to register
  * functions on an ALREADY-BUILT session. The sanctioned route —
  * `spark.sql.extensions=graft.functions.GraftExtensions` — only applies
  * at session construction; tests and notebooks hold a live session. */
object SqlInternals {
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       ident: FunctionIdentifier, info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
