package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 2-D Morton (Z-order) codes for data-layout clustering.
  *
  * Sorting (or sortWithinPartitions-ing) a table by the interleaved code
  * of two filter columns clusters BOTH dimensions at once, so parquet
  * row-group min/max stats prune scans for predicates on either column —
  * the multi-dimensional layout step a 100 TB table wants before write
  * (single-column sort only serves one predicate family).
  *
  * Built entirely from codegen'd bitwise primitives (shift/and/or with
  * the classic spread masks) — no UDF, no HOF, stays inside whole-stage
  * codegen. Works on the low 32 bits of each coordinate.
  */
object ZOrder {

  /** Spread the low 32 bits of `x` to the even bit positions (0,2,4,...)
    * of a 64-bit value.
    */
  def spreadBits(x: Column): Column = {
    val v0 = x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val v4 = v3.bitwiseOR(shiftleft(v3, 2)).bitwiseAND(lit(0x3333333333333333L))
    v4.bitwiseOR(shiftleft(v4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton code: bits of `x` on even positions, bits of `y` on odd. */
  def interleave(x: Column, y: Column): Column =
    spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1))
}
