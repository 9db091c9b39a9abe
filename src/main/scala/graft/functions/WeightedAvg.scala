package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact-decimal weighted average — the engine's representative typed UDAF
  * (SURVEY.md §2 B24). Numerator/denominator accumulate in BigDecimal so the
  * partial-aggregation merge order (map-side combine across partitions) can
  * never perturb the result; the final division happens once, in double, the
  * same way the DuckDB oracle computes CAST(sum AS DOUBLE)/CAST(sum AS
  * DOUBLE).
  */
case class WAvgBuf(num: BigDecimal, den: BigDecimal)

object WeightedAvg extends Aggregator[(BigDecimal, BigDecimal), WAvgBuf, Double] {
  override def zero: WAvgBuf = WAvgBuf(BigDecimal(0), BigDecimal(0))
  override def reduce(b: WAvgBuf, in: (BigDecimal, BigDecimal)): WAvgBuf =
    if (in == null || in._1 == null || in._2 == null) b
    else WAvgBuf(b.num + in._1 * in._2, b.den + in._2)
  override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
    WAvgBuf(a.num + b.num, a.den + b.den)
  override def finish(r: WAvgBuf): Double =
    if (r.den.signum == 0) Double.NaN else r.num.toDouble / r.den.toDouble
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
