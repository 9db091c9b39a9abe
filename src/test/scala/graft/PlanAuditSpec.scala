package graft

import graft.queries.Registry

/** Whole-registry plan audit: no query may plan a cartesian product, and
  * nested-loop joins are allowed only where they are the intended
  * single-broadcast-row probe (KNN queries broadcasting one query vector).
  * Guards every future query addition against silent scale regressions.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose plan legitimately contains BroadcastNestedLoopJoin:
    * a crossJoin against a broadcast single-row frame (the query vector /
    * best IVF cell). Bounded work: |corpus| x 1.
    */
  private val singleRowBroadcastOk =
    Set("q_knn_cosine", "q_knn_ivf", "q_dedup_embedding",
      "q_text_tfidf") // broadcasts the single-row corpus count N

  test("no registered query plans a CartesianProduct") {
    Registry.all.foreach { q =>
      val plan = q.build(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a cartesian product")
    }
  }

  test("nested-loop joins appear only as single-row broadcast probes") {
    Registry.all.foreach { q =>
      val plan = q.build(spark, sfDir).queryExecution.executedPlan.toString
      if (!singleRowBroadcastOk(q.name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name} has an unexpected nested-loop join")
      }
    }
  }
}
