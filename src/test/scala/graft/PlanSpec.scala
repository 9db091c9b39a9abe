package graft

import graft.queries.Registry

/** Physical-plan shape assertions (SURVEY.md §7.3 M5): the 100 TB posture
  * is that the right plan, not just the right rows, is the contract —
  * broadcasts where intended, pushdown reaching the scan, no nested-loop
  * joins on the scale paths, top-k without a global sort.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.all.find(_.name == name).get
      .build(spark, sfDir).queryExecution.executedPlan.toString

  test("folder_join and q_join_broadcast use broadcast hash joins") {
    assert(plan("folder_join").contains("BroadcastHashJoin"))
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_join_shuffle is a sort-merge join") {
    assert(plan("q_join_shuffle").contains("SortMergeJoin"))
  }

  test("filters are pushed down to the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("GreaterThan(l_discount") || p.contains("LessThan(l_quantity"))
  }

  test("column pruning: projection-only query reads only needed columns") {
    val p = plan("q_filter_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_shipdate"))
    assert(!readSchema.contains("l_tax"))
    assert(readSchema.contains("l_quantity"))
  }

  test("binned range join and neighbor-window jaccard avoid nested-loop joins") {
    Seq("q_join_range", "q_join_range_auto", "q_dedup_ngram_jaccard")
      .foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q has a nested-loop join")
    }
    // the registered q_dedup_minhash carries a 1-row recall-flag
    // broadcast since its r10 oracle pairing, so (like q_knn_lsh below)
    // the no-BNLJ pin moves to the raw operator: its band-bucket pair
    // generation must stay an equi-join, never all-pairs
    val mhPlan = graft.operators.Dedup
      .minhashPairs(graft.sources.Tables.documents(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("doc_id").as("id"),
          org.apache.spark.sql.functions.col("text")), threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(!mhPlan.contains("CartesianProduct"),
      "minhashPairs operator has a cartesian product")
    assert(!mhPlan.contains("BroadcastNestedLoopJoin"),
      "minhashPairs operator has a nested-loop join")
    // the registered q_knn_lsh now wraps the operator with bounded
    // probe-sample broadcasts (r10 oracle pairing), so the no-BNLJ pin
    // moves to the raw LSH operator itself: its bucket join must stay an
    // equi-join, never all-pairs
    val lshPlan = graft.operators.Vectors
      .knnLsh(graft.sources.Tables.embeddings(spark, sfDir), k = 5)
      .queryExecution.executedPlan.toString
    assert(!lshPlan.contains("CartesianProduct"),
      "knnLsh operator has a cartesian product")
    assert(!lshPlan.contains("BroadcastNestedLoopJoin"),
      "knnLsh operator has a nested-loop join")
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti (no materialized right side)") {
    assert(plan("q_join_semi").contains("LeftSemi"))
    assert(plan("q_join_anti").contains("LeftAnti"))
  }

  test("range-join probe filter is pushed into the events scan") {
    val p = plan("q_join_range")
    assert(p.contains("EqualTo(event_type,error)"))
  }

  test("rollup broadcasts all three dimension joins") {
    assert("BroadcastHashJoin".r.findAllIn(plan("q_rollup")).size == 3)
  }

  test("windowed aggregation shuffles once for the aggregate (plus output sort only)") {
    assert("Exchange".r.findAllIn(plan("q_stream_tumbling")).size <= 2)
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("SQL-text TPC-H Q3 broadcast-joins the filtered dim and avoids a global sort for its top-10") {
    val p = plan("q_sql_tpch_q3")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("SQL-text TPC-H Q6 pushes its filters to the lineitem scan") {
    val p = plan("q_sql_tpch_q6")
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("l_discount") && p.contains("l_quantity"))
  }

  test("stratified sampling pushes the per-group quota into a WindowGroupLimit") {
    // rn <= k over a per-lang window must prune to k rows per group
    // BEFORE the shuffle (partial group-limit), not rank-then-filter
    assert("WindowGroupLimit".r.findAllIn(
      plan("q_sample_stratified")).size >= 1)
  }

  test("aggregations are two-phase (partial + final hash aggregate)") {
    val p = plan("q_agg_hash")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("whole-stage codegen covers the flagship pipeline (final AQE plan)") {
    val df = Registry.all.find(_.name == "flagship").get.build(spark, sfDir)
    df.collect() // AQE finalizes (and codegens) the plan only on execution
    // codegen spans print as "*(n) Operator" in the simple plan string
    assert("""\*\(\d+\)""".r.findFirstIn(
      df.queryExecution.executedPlan.toString).isDefined)
  }

  test("q_text_vocab takes its top-50 with per-partition heaps and never runs a partition-less window") {
    val qe = Registry.all.find(_.name == "q_text_vocab").get
      .build(spark, sfDir).queryExecution
    // the vocab cutoff must be TakeOrderedAndProject (no global sort of
    // the 10^8-token vocabulary), and every WindowExec must carry a
    // partition spec — Spark's "No Partition Defined ... single
    // partition" path is banned from the declared surface
    assert(qe.executedPlan.toString.contains("TakeOrderedAndProject"),
      qe.executedPlan.toString.linesIterator.take(8).mkString("\n"))
    // check the OPTIMIZED LOGICAL plan: that is where foldable partition
    // keys get stripped (a lit(0) key silently degrades to the
    // partition-less form), and the physical tree hides inside the AQE
    // wrapper where collect() does not descend
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val partitionless = qe.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(partitionless.isEmpty,
      s"partition-less Window in optimized plan:\n${partitionless.mkString("\n")}")
  }

  test("correlated NOT EXISTS decorrelates to a left-anti join") {
    val p = plan("q_sql_exists")
    assert(p.contains("LeftAnti"), p.linesIterator.take(5).mkString("\n"))
    // the totalprice predicate pushes into the subquery's scan
    assert(p.contains("GreaterThan(o_totalprice"))
  }

  test("null-safe join key plans as a hash join, not a nested loop") {
    val p = plan("q_join_nullsafe")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.linesIterator.take(5).mkString("\n"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("stream-join batch form keeps the interval as a residual on an equi-join") {
    val p = plan("q_stream_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }
}
