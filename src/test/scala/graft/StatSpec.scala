package graft

import org.apache.spark.sql.functions._
import graft.queries.Registry

/** Semantic invariants of the round-3 stat/packing queries that the
  * row-hash oracle can't express directly.
  */
class StatSpec extends SparkSpec {

  private def run(name: String) =
    Registry.all.find(_.name == name).get.build(spark, sfDir)

  test("pack_sequences conserves tokens and packs contiguous bins per source") {
    val packed = run("q_pack_sequences")
    // conservation: bin token sums add up to the corpus token total
    val packedTotal = packed.agg(sum("bin_tokens")).first().getLong(0)
    val corpusTotal = graft.sources.Tables.documents(spark, sfDir)
      .select(size(filter(split(col("text"), " "), w => w =!= "")).as("n"))
      .agg(sum("n")).first().getLong(0)
    assert(packedTotal == corpusTotal)
    // bins are contiguous 0..maxBin within every source (floor of a
    // running sum can never skip a 512-token bucket: docs are far shorter)
    val bad = packed.groupBy("source")
      .agg(min("bin").as("mn"), max("bin").as("mx"),
        count(lit(1)).as("n_bins"))
      .filter(col("mn") =!= 0 || col("n_bins") =!= col("mx") + 1)
      .count()
    assert(bad == 0)
    // fill bound: bin b spans the running sum from its first doc's
    // pre-sum (< b*budget + prev doc's length) to the next bin's boundary
    // (>= (b+1)*budget), so every NON-final bin holds at least
    // budget - (max doc length) + 1 tokens — bins are genuinely packed,
    // not fragmenting.
    val budget = graft.queries.StatQueries.PackBudget
    val maxDoc = graft.sources.Tables.documents(spark, sfDir)
      .select(size(filter(split(col("text"), " "), w => w =!= "")).as("n"))
      .agg(max("n")).first().getInt(0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val underfull = packed
      .withColumn("mx", max("bin").over(w))
      .filter(col("bin") =!= col("mx") &&
        col("bin_tokens") < budget - maxDoc + 1)
      .count()
    assert(underfull == 0, s"non-final bins under the fill bound (maxDoc=$maxDoc)")
  }

  test("ntile deciles are balanced per event type") {
    val rows = run("q_ntile").collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      assert(rs.length == 10, s"$t has ${rs.length} deciles")
      val counts = rs.map(_.getAs[Long]("n"))
      assert(counts.max - counts.min <= 1, s"$t deciles unbalanced: ${counts.toSeq}")
    }
  }

  test("q_ntile matches the single-task window form row-for-row on real data") {
    // the distributed boundary-binning form (Ntile.exact) must reproduce
    // the built-in ntile window EXACTLY on the declared query's data —
    // the guard that rounds 4–6 enforced is gone because the semantics no
    // longer serialize (NtileSpec covers the adversarial tie/small paths)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("value", "event_id")
    val windowForm = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("event_type"), col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
    val got = run("q_ntile")
    assert(got.exceptAll(windowForm).isEmpty && windowForm.exceptAll(got).isEmpty,
      "distributed ntile diverged from the window form")
  }

  test("ntile_approx bins partition each group and stay within boundary-tie slack of n/10") {
    val rows = run("q_ntile_approx").collect()
    assert(rows.nonEmpty)
    // no NULL decile: a bracket miss in the boundary pass propagates NULL
    // by design — its absence IS the bracket-correctness invariant
    assert(rows.forall(!_.isNullAt(1)), "NULL decile: boundary bracket missed")
    val events = graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val n = events(t)
      // bins partition the group exactly (every row binned exactly once)
      assert(rs.map(_.getAs[Long]("n")).sum == n, s"$t: bins don't partition")
      val deciles = rs.map(_.getAs[Int]("decile"))
      assert(deciles.forall(d => d >= 1 && d <= 10), s"$t: decile out of range")
      // equi-depth up to discrete-boundary slack: bin sizes are n/10 ± ties
      // at boundaries; the continuous value column keeps ties rare, so the
      // named bound is ±max(2, 1% of n) per bin
      val slack = math.max(2L, n / 100)
      val target = n / 10.0
      rs.foreach { r =>
        val c = r.getAs[Long]("n")
        assert(math.abs(c - target) <= slack + 1,
          s"$t decile ${r.getAs[Int]("decile")}: $c vs n/10=$target")
      }
      // min/max of adjacent bins are ordered (boundaries monotone)
      val sorted = rs.sortBy(_.getAs[Int]("decile"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("max_value") <= b.getAs[Double]("min_value"),
            s"$t: overlapping bins")
        case _ => ()
      }
    }
  }

  test("stats_corr correlations are sane (-1..1) and means positive") {
    val rows = run("q_stats_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val corr = r.getAs[Double]("corr_qty_price")
      assert(corr >= -1.0 && corr <= 1.0)
      assert(r.getAs[Double]("mean_qty") > 0 && r.getAs[Double]("mean_price") > 0)
    }
  }

  test("event_retention offsets are non-negative and cohort day-0 exists") {
    val rows = run("q_event_retention").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("offset_days") >= 0))
    val cohorts = rows.map(_.getAs[Long]("cohort")).distinct
    val zeroOffsets = rows.filter(_.getAs[Long]("offset_days") == 0)
      .map(_.getAs[Long]("cohort")).distinct
    // every user's first day IS an offset-0 row for that cohort
    assert(cohorts.sorted.sameElements(zeroOffsets.sorted))
  }
}
