package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pin on the committed quiet-reference prior resource (VERDICT r12 item
  * 3): `graft/bench-prior.json` now feeds three load-bearing mechanisms —
  * per-query retry thresholds, the contended-window classification
  * (`membw_mt_ms` reference), and the published inflation statistic — so
  * its shape is pinned the way RegistrySpec pins the query registry:
  * every declared query must carry a prior cell (a missing cell silently
  * reverts that query to the bare 4 s floor AND drops it from the
  * inflation median), the sf must be the driver's bench scale, and the
  * full marker set of the recording run must be present (a reference
  * without markers cannot define "quiet"). The refresh protocol lives in
  * BASELINE.md: regenerate from a quiet full run's target/bench_full.json
  * whenever the sf0.1 cells shift materially, and record the run's
  * markers with it.
  */
class PriorSpec extends AnyFunSuite {

  private lazy val json: String = Bench.resourcePriorJson()
    .getOrElse(fail("committed prior resource graft/bench-prior.json missing"))

  test("committed prior is an sf0.1 quiet reference with the full marker set") {
    assert(Bench.parsePriorMarker(json, "sf0.1", "spin_ms") > 0.0)
    assert(Bench.parsePriorMarker(json, "sf0.1", "membw_ms") > 0.0)
    assert(Bench.parsePriorMarker(json, "sf0.1", "membw_mt_ms") > 0.0,
      "the contended classification needs the recording run's membw_mt")
    assert(Bench.parsePriorMarker(json, "sf0.1", "total_s") > 0.0)
    // the sf gate: cells must resolve at sf0.1 and ONLY at sf0.1
    assert(Bench.parsePriors(json, "sf0.1", 0.0, 0.0).nonEmpty)
    assert(Bench.parsePriors(json, "sf0.001", 0.0, 0.0).isEmpty)
  }

  test("every declared query carries a positive prior cell") {
    val raw = Bench.parsePriors(json, "sf0.1", 0.0, 0.0)
    val declared = SparkEntry.queries.keySet
    val missing = declared -- raw.keySet
    assert(missing.isEmpty,
      s"declared queries without a committed prior cell: ${missing.toSeq.sorted}")
    val nonPositive = declared.filter(q => raw.getOrElse(q, 0.0) <= 0.0)
    assert(nonPositive.isEmpty,
      s"non-positive prior cells: ${nonPositive.toSeq.sorted}")
    // and the reference carries no stale cells for queries that no
    // longer exist (a renamed query would otherwise keep mis-aiming its
    // old threshold forever)
    val stale = raw.keySet -- declared
    assert(stale.isEmpty, s"prior cells for undeclared queries: ${stale.toSeq.sorted}")
  }
}
