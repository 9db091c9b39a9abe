package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join (SURVEY.md §2 B9, §7.5): `a JOIN b ON b.t IN
  * (a.t, a.t + width]` written naively is a BroadcastNestedLoopJoin —
  * O(|a|*|b|), dead at scale. With bucket width == range width, every
  * probe row has exactly TWO candidate buckets, so the join becomes a
  * plain shuffled equi-join on (keys..., bucket) plus a residual range
  * filter — vanilla Catalyst operators end to end (per §7.5, preferred
  * over a custom SparkStrategy as long as it meets the bench gate, which
  * it does).
  */
object RangeJoin {

  /** Join `probe` to `build`: for each probe row, all build rows with the
    * same `keys` whose `buildTime` lies in (probeTime, probeTime + width].
    * Times are exact integer columns (e.g. unix_micros); `width` in the
    * same unit. Output: probe columns + build columns (both sides must be
    * pre-aliased to avoid collisions).
    */
  def innerBinned(
      probe: DataFrame, probeTime: String,
      build: DataFrame, buildTime: String,
      width: Long,
      keys: Seq[(String, String)] = Nil): DataFrame = {
    // FLOOR division for the bucket, not Spark's truncate-toward-zero
    // `div`: negative times would otherwise land one bucket high and miss
    // matches (DuckDB's `//` — the oracle's operator — floors). Subtracting
    // pmod (always nonnegative) makes the dividend an exact multiple, so
    // the `div` truncation is exact — all integer arithmetic, ANSI-safe.
    def floorDiv(t: String): String = s"(($t - pmod($t, ${width}L)) div ${width}L)"
    val p = probe
      .withColumn("_pb", expr(floorDiv(probeTime)))
      .withColumn("_cb", explode(array(col("_pb"), col("_pb") + 1)))
      .drop("_pb")
    val b = build.withColumn("_bb", expr(floorDiv(buildTime)))
    val keyCond = keys
      .map { case (pk, bk) => p(pk) === b(bk) }
      .foldLeft(col("_cb") === col("_bb"))(_ && _)
    val rangeCond =
      b.col(buildTime) > p.col(probeTime) &&
        b.col(buildTime) <= p.col(probeTime) + width
    p.join(b, keyCond && rangeCond, "inner").drop("_cb", "_bb")
  }
}
