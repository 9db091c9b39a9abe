package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Registry

/** Pins the declared-surface counts that the docs (README, BASELINE.md,
  * .claude/skills/verify/SKILL.md) cite — a silently-dropped query shows
  * up here instead of going unnoticed behind stale prose (ADVICE r1).
  * Update the counts HERE and in those docs together, deliberately.
  */
class RegistrySpec extends AnyFunSuite {

  test("declared surface: 111 queries, 106 oracle-paired, 5 rows-only") {
    val all = Registry.all
    assert(all.size == 111, s"query count drifted: ${all.size}")
    assert(all.count(_.oracle.isDefined) == 106,
      s"oracle-paired count drifted: ${all.count(_.oracle.isDefined)}")
    val rowsOnly = all.filter(_.oracle.isEmpty).map(_.name).toSet
    // every rows-only query must be one of the declared sketch/hash-internal
    // ops, each value-pinned by a named spec (SURVEY.md §2.1).
    // q_multimodal_decode moved to the oracle-paired set in r5 (the real
    // PNG codec's pixel digest is SQL-reconstructible); q_udf_geo_truncate
    // in r6 (it shares coord_truncate's scalar oracle);
    // q_agg_approx_distinct in r7 (declared output = exact count + a
    // within-5% flag, so the non-replicable HLL value never enters the
    // hash while still being checked through the flag);
    // q_percentile_approx in r9 (same pattern — exact interpolated
    // percentiles + a rank-interval within_accuracy flag);
    // q_knn_lsh and q_knn_ivf in r10 (declared rows = exact sampled-probe
    // top-k + a genuinely-computed recall@k flag of the real index);
    // q_dedup_minhash and q_dedup_simhash in r10 (declared rows = exact
    // window-blocked Jaccard pairs + a genuine recall flag of the real
    // candidate set — DedupRecallProbe backs the bounds).
    // The remaining five are cluster/pipeline shapes whose OUTPUT is a
    // connected-components labeling (not SQL-expressible even as a truth
    // frame without a recursive-CTE oracle) — each value-pinned by
    // DedupSpec/KnnSpec identity and equivalence tests.
    assert(rowsOnly == Set(
      "q_dedup_clusters", "q_dedup_clusters_exact_first",
      "q_dedup_pipeline", "q_dedup_pipeline_exact_first",
      "q_knn_lsh_dedup"))
  }
}
