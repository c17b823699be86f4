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

  /** Execute a PARSED (still unresolved) logical plan as a DataFrame —
    * the `private[sql]` Dataset.ofRows route `SparkSession.sql` itself
    * takes after parsing. Lets the MERGE INTO surface hand the
    * statement's USING side (a table name or a full subquery) to the
    * analyzer verbatim instead of re-printing it to SQL text. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[SparkSession], plan)

  /** The `private[sql]` constructor streaming sources use for the
    * DataFrame a `Source.getBatch` hands back: the micro-batch engine
    * asserts `isStreaming = true` on it, which no public constructor
    * can set. Same route as Spark's own FileStreamSource. */
  def internalCreateStreamingDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
