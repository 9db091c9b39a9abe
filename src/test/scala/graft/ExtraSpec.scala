package graft

import org.apache.spark.sql.functions._
import graft.operators.CalTopo
import graft.queries.{ExtraQueries, Registry}
import graft.sources.CalTopoFeatures

/** Pins for the rows-only coverage completers: HLL estimate bounds and the
  * scalar UDF's equivalence with the codegen'd typed truncation path.
  */
class ExtraSpec extends SparkSpec {

  test("approx_count_distinct is within 3*rsd of the exact count per group") {
    val approx = Registry.all.find(_.name == "q_agg_approx_distinct").get
      .build(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val err = math.abs(approx(k).toDouble - n) / n
      assert(err <= 0.06, s"group $k: approx=${approx(k)} exact=$n err=$err")
    }
  }

  test("percentile_approx is within the sketch rank-error bound of exact percentiles") {
    val approx = Registry.all.find(_.name == "q_percentile_approx").get
      .build(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_extendedprice"), lit(0.95)).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p50, p95)) =>
      val (a50, a95) = approx(k)
      // accuracy=10000 bounds rank error at n/10000; prices are roughly
      // uniform so a 2% value tolerance is generous while still catching
      // a broken sketch (which would be off by whole percentile bands)
      assert(math.abs(a50 - p50) / p50 <= 0.02, s"$k p50: $a50 vs $p50")
      assert(math.abs(a95 - p95) / p95 <= 0.02, s"$k p95: $a95 vs $p95")
      assert(a50 <= a95, s"$k: p50 > p95")
    }
  }

  test("generic-rank UDF truncation equals the codegen'd typed path on all driver rows") {
    val typed = CalTopo.coordTruncate(
      CalTopo.mainFlow(CalTopoFeatures.build(spark, sfDir)))
      .select(col("id"), col("geometry.coordinates").as("c"))
    val viaUdf = Registry.all.find(_.name == "q_udf_geo_truncate").get
      .build(spark, sfDir)
      .select(col("id"), col("coords3").as("c"))
    assert(viaUdf.exceptAll(typed).count() == 0)
    assert(typed.exceptAll(viaUdf).count() == 0)
  }

  test("UDF truncation handles degenerate inputs") {
    val f = ExtraQueries.truncateCoordsJson
    assert(f(null) == null)
    assert(f("[1,2]") == "[1,2]")
    assert(f("[1,2,3,4,5]") == "[1,2,3]")
    assert(f("[[1,2,3,4],[5,6,7,8]]") == "[[1,2,3],[5,6,7]]")
    assert(f("[[[1,2,3,4]]]") == "[[[1,2,3]]]")
  }
}
