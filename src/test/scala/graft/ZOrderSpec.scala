package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Morton interleave pinned against a bit-by-bit reference implementation
  * and hand-computed values.
  */
class ZOrderSpec extends SparkSpec {

  /** Reference: interleave bit i of x to position 2i, bit i of y to 2i+1. */
  private def ref(x: Long, y: Long): Long =
    (0 until 32).foldLeft(0L) { (acc, i) =>
      acc |
        (((x >> i) & 1L) << (2 * i)) |
        (((y >> i) & 1L) << (2 * i + 1))
    }

  test("hand-computed codes") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (0xFFFFFFFFL, 0L))
      .toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (3,5): x=0b11 spreads to 0b0101; y=0b101 spreads to 0b010001,
    // shifted left = 0b100010; OR = 0b100111 = 39
    assert(got == Seq(0L, 1L, 2L, 39L, 0x5555555555555555L))
  }

  test("expression equals the bit-by-bit reference on a 64x64 grid") {
    import spark.implicits._
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("quadrant locality: all codes of the low quadrant precede any code with a high coordinate bit") {
    // every (x, y) in [0,16)^2 codes below 256 (4 bits per dim -> 8 code
    // bits); any coordinate >= 16 sets a code bit at position >= 8 — the
    // property that makes z-sorted row groups prunable on BOTH columns
    for (x <- 0L until 16L; y <- 0L until 16L)
      assert(ref(x, y) < 256)
    assert(ref(16L, 0L) >= 256 && ref(0L, 16L) >= 256)
  }
}
