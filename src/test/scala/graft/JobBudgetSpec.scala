package graft

/** Driver-blocking JOB budget pin (VERDICT r9 item 6): ShuffleBudgetSpec
  * pins Exchange counts, but the sf0.001 fixed-cost floor is made of JOB
  * round-trips — censuses, probe aggregates, checkpoint materializations,
  * AQE stage jobs — which no plan-shape audit sees. This spec records,
  * for the census/probe-bearing queries (the floor payers the r10 cut
  * targeted), the total jobs launched from query build through a noop
  * write, and fails on growth: an edit that silently re-adds an eager
  * checkpoint or splits a fused census pays a job this pin catches, the
  * way ShuffleBudgetSpec catches a silently-added shuffle.
  *
  * Budgets are ceilings measured in THIS spec's session (local[4],
  * shuffle=4, sf0.001 — job counts include per-shuffle AQE stage jobs,
  * so they are config-sensitive; re-record deliberately when a query's
  * pass structure changes). Table metadata is pre-warmed so the memoized
  * first-load job (Tables.load cache, r10) never lands on whichever
  * pinned query happens to run first.
  */
class JobBudgetSpec extends SparkSpec {

  // r14 re-record: Tables.spreadSmall adds one round-robin exchange (and
  // its AQE stage jobs) per kernel-heavy small-scan consumer at this
  // spec's toy SF — it buys cores-wide kernel parallelism at bench SFs
  // and vanishes at scale; the dedup-family counts DROPPED (the clusters
  // route census now counts the undirected pair frame, skipping the
  // exploded/distinct/dst-repartition edge build on the driver route).
  private val budget: Map[String, Int] = Map(
    "q_dedup_clusters" -> 20,   // r10 oracle pairing: truth CC + minhash CC;
                                // r12 re-record (+3): the truth frame's
                                // eager gram-array checkpoint (TruthArrProbe
                                // trade — kills the racing duplicate gram
                                // pass) and the restricted flag's tids
                                // census + small-side materialization;
                                // r13 re-record (+2): the agreement flag's
                                // endpoint broadcasts now gate on the
                                // restricted frame's OWN census (ADVICE
                                // r12 — robust to duplicated-label
                                // callers), which also materializes its
                                // checkpoint eagerly ahead of the two
                                // consuming joins;
                                // r15 re-record 26 -> 20 (VERDICT r14
                                // item 1): ONE shared truth census routes
                                // the CC call (knownCount skips clusters'
                                // own checkpoint+census) and bounds the
                                // flag's tids broadcast (truthPairs skips
                                // the tids census); the flag's driver-
                                // routed minhash assignment is a
                                // LocalRelation, so its semi-join
                                // restriction + small census are skipped
    "q_dedup_clusters_exact_first" -> 31, // r10 oracle pairing; r13 +2/+1
                                // (flag small-census, see q_dedup_clusters)
    "q_dedup_pipeline_exact_first" -> 29, // r10 oracle pairing; r13
                                // re-record at measured 32 (same change)
    "q_event_resample" -> 4,
    "q_knn_ivf" -> 11,          // r15: bounded recall-flag broadcast
    "q_knn_lsh" -> 12,
    "q_knn_lsh_dedup" -> 19,    // r10 oracle pairing: + exact batch & flag;
                                // r15 re-record 21 -> 19 (census-gated rep
                                // broadcasts + bounded flag broadcast)
    "q_ntile" -> 8,
    "q_ntile_approx" -> 19,
    "q_percentile" -> 17,
    "q_percentile_approx" -> 19,
    "q_sample_mixture" -> 7,
    "q_text_tfidf" -> 9)

  /** Ceilings include AQE stage jobs, so they are Spark-version- and
    * AQE-heuristic-sensitive (ADVICE r10): a patch upgrade can legally add
    * a stage job with no repo edit. The slack absorbs that noise while a
    * REAL regression — an eager checkpoint or an unfused census, always
    * ≥3 jobs in the measured history — still trips the pin. On a
    * deliberate pass-structure change, re-record the table, not the slack.
    */
  private val slack = 2

  test("census/probe-bearing queries launch no more jobs than recorded") {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val counter = new JobCountProbe.JobCounter
    spark.sparkContext.addSparkListener(counter)
    try {
      def drained(): Long = {
        org.apache.spark.GraftListenerBridge
          .waitUntilListenerBusEmpty(spark.sparkContext)
        counter.snapshot
      }
      val counts = budget.toSeq.sortBy(_._1).map { case (name, b) =>
        val j0 = drained()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (name, (drained() - j0).toInt, b)
      }
      val over = counts.collect { case (n, j, b) if j > b + slack =>
        s"$n: $j jobs > budget $b + slack $slack" }
      assert(over.isEmpty,
        s"""job budgets exceeded: ${over.mkString("; ")}
           |all counts: ${counts.map { case (n, j, _) => s"$n=$j" }.mkString(", ")}""".stripMargin)
    } finally spark.sparkContext.removeSparkListener(counter)
  }
}
