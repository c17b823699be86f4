package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-tests / Deequ-style
  * contract check a pipeline runs on every table before publishing (the
  * reference enforces the same invariants implicitly through its MERGE
  * keys and NOT-NULL DDL columns; here they are first-class, reportable
  * checks).
  *
  * Scale shape: every ROW-LOCAL rule (not-null, accepted-values, range,
  * custom predicate) folds into ONE shared scan — a single wide
  * conditional aggregate, partial→final, regardless of how many rules are
  * declared. Key-uniqueness adds one groupBy on its key columns;
  * referential integrity adds one anti-join per foreign table (build side
  * = the referenced KEY column only, broadcast when small). Nothing ever
  * collects; the report is one row per rule.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** `col` must never be NULL. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }

  /** `col` must be one of `values` (NULLs are violations too — compose
    * with [[NotNull]] if you want them reported separately). */
  final case class AcceptedValues(col: String, values: Seq[String]) extends Rule {
    def name = s"accepted_values($col)"
  }

  /** `col` must lie in [lo, hi]; NULLs don't count against the range. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col)"
  }

  /** Arbitrary row predicate; violations = rows where it is false/NULL. */
  final case class Satisfies(label: String, predicate: Column) extends Rule {
    def name = s"satisfies($label)"
  }

  /** `cols` must be a unique key: violations = rows beyond the first per
    * duplicated key (so a clean table reports 0, a doubled table n/2). */
  final case class UniqueKey(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Every non-NULL `col` must appear in `refCol` of `ref` — foreign-key
    * integrity. */
  final case class RefIntegrity(col: String, ref: DataFrame, refCol: String)
      extends Rule {
    def name = s"ref_integrity($col)"
  }

  /** Violation count + pass flag per rule, one output row per rule, in
    * declaration order (`rule_no`). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectations: need at least one rule")
    val rowLocal: Seq[(Int, String, Column)] = rules.zipWithIndex.collect {
      case (r: NotNull, i) => (i, r.name, col(r.col).isNull)
      case (r: AcceptedValues, i) =>
        (i, r.name, !coalesce(col(r.col).isin(r.values: _*), lit(false)))
      case (r: InRange, i) =>
        (i, r.name, col(r.col).isNotNull &&
          !col(r.col).cast("double").between(r.lo, r.hi))
      case (r: Satisfies, i) => (i, r.name, !coalesce(r.predicate, lit(false)))
    }
    val locals: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.map { case (i, _, bad) =>
          sum(when(bad, 1L).otherwise(0L)).as(s"__v_$i")
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val rows = rowLocal.map { case (i, name, _) =>
          struct(lit(i).as("rule_no"), lit(name).as("rule"),
            col(s"__v_$i").as("violations"))
        }
        Some(one.select(explode(array(rows: _*)).as("s")).select("s.*"))
      }
    val others: Seq[DataFrame] = rules.zipWithIndex.collect {
      case (r: UniqueKey, i) =>
        df.groupBy(r.cols.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"))
          .select(lit(i).as("rule_no"), lit(r.name).as("rule"),
            col("violations"))
      case (r: RefIntegrity, i) =>
        df.where(col(r.col).isNotNull)
          .join(r.ref.select(col(r.refCol).as(r.col)).distinct(),
            Seq(r.col), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(i).as("rule_no"), lit(r.name).as("rule"),
            col("violations"))
    }
    (locals.toSeq ++ others).reduce(_ unionByName _)
      .withColumn("passed", col("violations") === 0L)
  }

  /** Streaming quality gate: every micro-batch's rule report appends to a
    * parquet audit trail tagged with its batch id — the per-ingest
    * contract check a production stream runs BEFORE publishing a batch
    * (read the audit, alert on `passed = false`). Append-only like the
    * quarantine path: redelivered batches re-report under the same batch
    * id, harmless in an audit. No wall-clock columns — the report is
    * deterministic and replayable. */
  def checkStream(stream: DataFrame, rules: Seq[Rule], auditDir: String,
                  checkpoint: String, availableNow: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          check(batch, rules).withColumn("batch_id", lit(batchId))
            .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(auditDir)
      }
      .option("checkpointLocation", checkpoint)
    (if (availableNow)
       writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }
}
