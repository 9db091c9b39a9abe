package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.{CalTopoFeatures, Tables}

/** SQL entry point: registers every driver table (plus the synthetic
  * CalTopo feature table) as temp views so the whole engine surface is
  * reachable from plain `spark.sql`. DataFrame builders and SQL share one
  * Catalyst planner, so plans (pushdown, broadcast, AQE) are identical.
  */
object Sql {

  /** Register all tables for `dir` as temp views; returns the session. */
  def register(spark: SparkSession, dir: String): SparkSession = {
    Catalog.tableNames.foreach {
      // events goes through the nanos->micros timestamp normalization
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t => Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    CalTopoFeatures.build(spark, dir)
      .createOrReplaceTempView("caltopo_features")
    spark
  }

  /** One-shot: register views and run a SQL query. */
  def run(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }
}
