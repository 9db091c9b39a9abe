package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §7.5 family: an operator Spark lacks natively,
  * composed from built-ins per the escape-hatch preference order): for
  * each left row, the single most recent right row with the same key and
  * `rightTime <= leftTime`.
  *
  * Shape: union the two sides tagged, sort within (key) by (time,
  * right-before-left), and carry the latest right-side payload forward
  * with last_value(ignoreNulls) — ONE shuffle on the key, no join node at
  * all, no per-key state on the driver. At 100 TB this is the same
  * sort-within-partitions cost as a sort-merge join but with half the
  * inputs moved (the right side rides along in the same exchange).
  */
object AsofJoin {

  /** `left` must have columns (key, ltime, ...); `right` (key, rtime,
    * payload...). Returns left rows + `payloadCols` from the matched
    * right row (null when no right row precedes). Ties on equal time:
    * the right row sorts BEFORE the left row, so an exactly-simultaneous
    * right row matches (<=, DuckDB ASOF semantics).
    *
    * `tieBreak` names payload columns appended to the carry window's
    * ordering: when several right rows share the same (key, time), the one
    * with the greatest tie-break tuple wins, deterministically across
    * runs/partitionings. Without it the winner among exact right-side
    * (key, time) ties is whichever row the sort happens to place last
    * (the window order (_t, _side) alone is not a total order).
    */
  def backward(
      left: DataFrame, leftTime: String,
      right: DataFrame, rightTime: String,
      key: String, payloadCols: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select((leftCols.map(col) :+ col("_t") :+ col("_side")) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    // null-keyed right rows can never match under SQL join semantics, but
    // a window partition WOULD group them with null-keyed left rows — drop
    // them up front (null-keyed left rows then correctly get null payload)
    val r = right
      .filter(col(key).isNotNull)
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select((leftCols.map(c =>
          // the key is real on both sides; other left columns ride as null
          if (c == key) col(key)
          else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("_t") :+ col("_side")) ++ payloadCols.map(col): _*)
    val unioned = l.unionByName(r.select(l.columns.toIndexedSeq.map(col): _*))
    // left rows carry null tie-break values; nulls-first keeps them ordered
    // AFTER all same-instant right rows only via _side, so the tie-break
    // columns never reorder a left row relative to right rows
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t") +: col("_side") +: tieBreak.map(c => col(c).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the payload carries as ONE struct (null on left rows, so ignoreNulls
    // skips them): the winning right row's columns stay together even when
    // some of its fields are null — per-column last(ignoreNulls) would
    // backfill a null field from an EARLIER right row, emitting a mixed
    // row that never existed
    val carried = unioned.withColumn("_p",
      last(when(col("_side") === 0, struct(payloadCols.map(col): _*)),
        ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("_p").getField(c).as(c)): _*)
  }
}
