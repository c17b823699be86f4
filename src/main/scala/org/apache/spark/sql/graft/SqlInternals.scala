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

  /** `localCheckpoint` that KEEPS its hash partitioning visible to the
    * planner. `Dataset.localCheckpoint` materializes partitions 1:1 but
    * (under AQE) records `UnknownPartitioning` on the resulting
    * `LogicalRDD`, so every later join/aggregate on the checkpoint
    * re-shuffles it — fatal for iterative operators that re-join a large
    * static relation every round. This repartitions by `keys` into the
    * session's shuffle-partition count (REPARTITION_BY_NUM — AQE never
    * changes an explicit count, so the declared partitioning is the
    * physical truth), checkpoints, and re-wraps the checkpoint RDD in a
    * `LogicalRDD` that declares `HashPartitioning(keys, n)` and the TRUE
    * materialized size as its statistics (see [[localCheckpointSized]]),
    * so these typically-big relations are never mis-broadcast off a stale
    * estimate. */
  def localCheckpointPartitioned(df: org.apache.spark.sql.DataFrame,
                                 keys: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.LogicalRDD
    val cs = df.sparkSession.asInstanceOf[SparkSession]
    val n = cs.sessionState.conf.numShufflePartitions
    val cp = df.repartition(n, keys.map(df.col): _*).localCheckpoint()
    cp.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val attrs = keys.map { k =>
          // by-name resolution must be UNAMBIGUOUS: with duplicate names it
          // could declare HashPartitioning on the wrong attribute and let
          // the planner elide a required exchange (wrong join results)
          l.output.filter(_.name == k) match {
            case Seq(one) => one
            case ms => throw new IllegalArgumentException(
              s"localCheckpointPartitioned: ${ms.size} columns named $k " +
                s"in ${l.output.map(_.name)}")
          }
        }
        org.apache.spark.sql.classic.Dataset.ofRows(cs,
          LogicalRDD(l.output, l.rdd, HashPartitioning(attrs, n), Nil,
            l.isStreaming, l.stream)(cs, materializedStats(cs, l), None))
      case _ => cp
    }
  }

  /** `localCheckpoint` that replaces the origin plan's size ESTIMATE with
    * the checkpoint's TRUE materialized byte size from the block manager.
    * Catalyst's estimate for an iterative round's output (joins over
    * aggregates over prior checkpoints) can be wrong by orders of
    * magnitude in either direction — observed flipping a 74 MB edge list
    * onto the broadcast side of a join whose other side held 20 k labels.
    * The materialized size is exact, so build-side choice is stable. */
  def localCheckpointSized(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    val cs = df.sparkSession.asInstanceOf[SparkSession]
    val cp = df.localCheckpoint()
    cp.queryExecution.analyzed match {
      case l: LogicalRDD =>
        org.apache.spark.sql.classic.Dataset.ofRows(cs,
          LogicalRDD(l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(cs, materializedStats(cs, l), None))
      case _ => cp
    }
  }

  /** True stored size of an (eagerly materialized) checkpoint's RDD, as
    * planner statistics. Deserialized in-memory blocks overstate raw
    * bytes by the object-layout factor, which errs on the safe side for
    * broadcast decisions. */
  private def materializedStats(cs: SparkSession,
                                l: org.apache.spark.sql.execution.LogicalRDD)
      : Option[org.apache.spark.sql.catalyst.plans.logical.Statistics] =
    cs.sparkContext.getRDDStorageInfo.find(_.id == l.rdd.id)
      .map(i => i.memSize + i.diskSize).filter(_ > 0)
      .map(s => org.apache.spark.sql.catalyst.plans.logical.Statistics(
        sizeInBytes = BigInt(s)))

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
