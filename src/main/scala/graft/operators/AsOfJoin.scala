package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    // carried payload: requested right columns + the right row's own ts —
    // never null on a real right row, so it doubles as the match sentinel
    // (a null payload column must not drop a matched left row)
    val carried = rightCols.map(c => c -> right.schema(c).dataType) :+
      (tsCol -> right.schema(tsCol).dataType)
    def carryName(i: Int) = s"__r$i"
    // tagged union: right rows sort BEFORE left rows at equal ts (side 0 <
    // 1), so an exactly-simultaneous right row is visible to the left row
    // (ts ≤ ts); among equal-(key, ts) right rows the ascending tieBreak
    // puts the greatest LAST, which is the one the running last() retains
    val lTagged = left.withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(right.schema(tieBreak).dataType))
      .select(leftCols.map(col) ++ Seq(col("__side"), col("__tb")) ++
        carried.zipWithIndex.map { case ((_, dt), i) =>
          lit(null).cast(dt).as(carryName(i))
        }: _*)
    val rTagged = right.select(
      Seq(col(key), col(tsCol)) ++
        leftCols.filterNot(Seq(key, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"), col(tieBreak).as("__tb")) ++
        carried.zipWithIndex.map { case ((c, _), i) =>
          col(c).as(carryName(i))
        }: _*)

    val merge = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outNames = rightCols :+ rightTsAs
    lTagged.unionByName(rTagged)
      .select((leftCols.map(col) :+ col("__side")) ++
        carried.zipWithIndex.map { case (_, i) =>
          last(col(carryName(i)), ignoreNulls = true).over(merge)
            .as(outNames(i))
        }: _*)
      .where(col("__side") === 1 && col(rightTsAs).isNotNull)
      .drop("__side")
  }
}
