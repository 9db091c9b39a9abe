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
