package graft.functions

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded "n smallest ids" aggregate: state is a sorted array of AT MOST
  * `n` longs no matter how many rows a group holds — the map-side
  * combinable replacement for `sort_array(collect_list(id))[1..n]`, whose
  * single-row buffer grows with the group and cannot spill (VERDICT r5
  * item 1: one vector duplicated 10⁸ times builds a 10⁸-element array in
  * one aggregation buffer). Used by
  * [[graft.operators.Vectors.knnLshDeduped]], where only a group's n
  * lowest member ids can ever reach a top-k result; partial aggregation
  * collapses each map partition to ≤ n ids per group before the shuffle,
  * so the shuffle carries O(groups · n), not O(rows).
  */
class BottomIds(n: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(n > 0, s"BottomIds needs n > 0, got $n")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert `v` keeping the buffer sorted ascending and capped at n. */
  override def reduce(b: Array[Long], v: Long): Array[Long] = {
    if (b.length >= n && v >= b(b.length - 1)) return b
    val pos = {
      // first index with b(i) > v (duplicate ids cannot occur, but the
      // bound is correct for them too)
      var lo = 0; var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b(mid) <= v) lo = mid + 1 else hi = mid
      }
      lo
    }
    val outLen = math.min(b.length + 1, n)
    val out = new Array[Long](outLen)
    System.arraycopy(b, 0, out, 0, pos)
    if (pos < outLen) {
      out(pos) = v
      System.arraycopy(b, pos, out, pos + 1, outLen - pos - 1)
    }
    out
  }

  /** Merge two sorted bounded buffers, keeping the n smallest. */
  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(x.length + y.length, n))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { i += 1; x(i - 1) }
        else { j += 1; y(j - 1) }
      o += 1
    }
    out
  }

  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder = ExpressionEncoder[Array[Long]]()
  override def outputEncoder = ExpressionEncoder[Array[Long]]()
}

object BottomIds {
  /** `bottomIds(n)(idCol)`: the group's n smallest ids, sorted ascending. */
  def apply(n: Int)(id: Column): Column =
    udaf(new BottomIds(n), Encoders.scalaLong).apply(id)
}
