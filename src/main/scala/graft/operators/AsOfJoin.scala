package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (point-in-time) join: each left row picks the single latest right
  * row of the same key with `rightTs <= leftTs` — trade attribution,
  * feature lookup at label time, "state as of the event". Spark has no
  * native ASOF join (DuckDB/Pandas do); the naive encoding
  * `join(key, r.ts <= l.ts)` + max-per-left explodes quadratically on hot
  * keys.
  *
  * Implementation is the scalable merge encoding: union both sides tagged
  * with a side marker, hash-partition by key, sort each partition by
  * (ts, side, tieBreak) and carry the last-seen right payload forward with
  * `last(_, ignoreNulls)` over the running window — every left row then
  * holds exactly the latest right-at-or-before it, with (key, ts) ties
  * among right rows resolved to the greatest `tieBreak` BY the sort order
  * itself (no separate dedup pass). ONE shuffle on the key, one
  * per-partition sort, output rows ≤ left rows: the same plan shape as a
  * groupBy at 100 TB, with none of the range-join blowup.
  */
object AsOfJoin {

  /** `left` asof-joined to `right`: result = left columns + `rightCols`
    * from the latest right row with the same `key` and right `tsCol` ≤
    * left `tsCol` (inclusive), plus that right row's timestamp as
    * `rightTsAs`. Left rows with no prior right row are dropped (inner
    * semantics, like DuckDB's ASOF JOIN). Right rows tying on (key, ts)
    * resolve deterministically to the greatest `tieBreak` value. */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
           rightCols: Seq[String], tieBreak: String,
           rightTsAs: String = "as_of_ts"): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => c.startsWith("__") || c == rightTsAs),
      s"asOf: left columns may not start with __ or equal '$rightTsAs'")
    require(rightCols.forall(c => !leftCols.contains(c)),
      s"asOf: rightCols ${rightCols.filter(leftCols.contains)} collide with " +
        "left columns — alias them before the join")
    // carried payload: ONE struct holding the requested right columns plus
    // the right row's own ts. A struct built from a real right row is never
    // null even when its fields are, so (a) it doubles as the match
    // sentinel and (b) the running last() below forwards all fields from
    // the SAME right row — per-column forward-fill would silently splice a
    // non-null value from an OLDER right row into a newer row's nulls
    // (DuckDB/Pandas ASOF return the null)
    val carried = rightCols :+ tsCol
    val payloadType = StructType(carried.zipWithIndex.map { case (c, i) =>
      StructField(s"_$i", right.schema(c).dataType)
    })
    // tagged union: right rows sort BEFORE left rows at equal ts (side 0 <
    // 1), so an exactly-simultaneous right row is visible to the left row
    // (ts ≤ ts); among equal-(key, ts) right rows the ascending tieBreak
    // puts the greatest LAST, which is the one the running last() retains
    val lTagged = left.withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(right.schema(tieBreak).dataType))
      .withColumn("__r", lit(null).cast(payloadType))
    val rTagged = right.select(
      Seq(col(key), col(tsCol)) ++
        leftCols.filterNot(Seq(key, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"), col(tieBreak).as("__tb"),
          struct(carried.zipWithIndex.map { case (c, i) =>
            col(c).as(s"_$i")
          }: _*).as("__r")): _*)

    val merge = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outNames = rightCols :+ rightTsAs
    lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(merge))
      .where(col("__side") === 1 && col("__m").isNotNull)
      .select(leftCols.map(col) ++ outNames.zipWithIndex.map { case (n, i) =>
        col("__m").getField(s"_$i").as(n)
      }: _*)
  }
}
