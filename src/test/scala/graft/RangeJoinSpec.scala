package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned range join == naive theta join on random data, without the
  * nested-loop plan.
  */
class RangeJoinSpec extends SparkSpec {

  private def mk(n: Int, seed: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
      .toDF("id", "key", "t")
  }

  test("binned inner range join equals the naive theta join") {
    val probe = mk(300, 1).select(col("id").as("p_id"),
      col("key").as("p_key"), col("t").as("p_t"))
    val build = mk(300, 2).select(col("id").as("b_id"),
      col("key").as("b_key"), col("t").as("b_t"))
    val width = 500L

    val binned = RangeJoin.innerBinned(probe, "p_t", build, "b_t", width,
        keys = Seq(("p_key", "b_key")))
      .select("p_id", "b_id").orderBy("p_id", "b_id").collect()

    val naive = probe.join(build,
        col("p_key") === col("b_key") &&
          col("b_t") > col("p_t") && col("b_t") <= col("p_t") + width)
      .select("p_id", "b_id").orderBy("p_id", "b_id").collect()

    assert(binned.nonEmpty)
    assert(binned.sameElements(naive))
  }

  test("negative times bucket by floor division — matches across zero survive") {
    import spark.implicits._
    // probe t=-3: range (-3, 7] must catch build t=-1 and t=5.
    // truncate-toward-zero bucketing put -3 in bucket 0 (floor: -1) and
    // missed the build row at bucket -1 (ADVICE r1).
    val probe = Seq((1L, 0L, -3L)).toDF("p_id", "p_key", "p_t")
    val build = Seq((10L, 0L, -1L), (11L, 0L, 5L), (12L, 0L, -4L), (13L, 0L, 8L))
      .toDF("b_id", "b_key", "b_t")
    val got = RangeJoin.innerBinned(probe, "p_t", build, "b_t", 10L,
        keys = Seq(("p_key", "b_key")))
      .select("b_id").orderBy("b_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L, 11L))
    // randomized equivalence with negative times mixed in
    val rnd = new scala.util.Random(7)
    val p2 = (1 to 200).map(i => (i.toLong, rnd.nextInt(3).toLong,
      rnd.nextInt(4000).toLong - 2000)).toDF("p_id", "p_key", "p_t")
    val b2 = (1 to 200).map(i => (i.toLong, rnd.nextInt(3).toLong,
      rnd.nextInt(4000).toLong - 2000)).toDF("b_id", "b_key", "b_t")
    val binned = RangeJoin.innerBinned(p2, "p_t", b2, "b_t", 300L,
        keys = Seq(("p_key", "b_key")))
      .select("p_id", "b_id").orderBy("p_id", "b_id").collect()
    val naive = p2.join(b2,
        col("p_key") === col("b_key") &&
          col("b_t") > col("p_t") && col("b_t") <= col("p_t") + 300L)
      .select("p_id", "b_id").orderBy("p_id", "b_id").collect()
    assert(binned.nonEmpty && binned.sameElements(naive))
  }

  test("binned plan is an equi-join, not a nested loop") {
    val probe = mk(50, 3).select(col("id").as("p_id"),
      col("key").as("p_key"), col("t").as("p_t"))
    val build = mk(50, 4).select(col("id").as("b_id"),
      col("key").as("b_key"), col("t").as("b_t"))
    val plan = RangeJoin.innerBinned(probe, "p_t", build, "b_t", 500L,
        keys = Seq(("p_key", "b_key")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
