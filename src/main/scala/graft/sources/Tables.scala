package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full control of
  * column pruning and predicate pushdown — callers `select`/`filter` and the
  * parquet scan shrinks accordingly (`ReadSchema`/`PushedFilters` asserted in
  * PlanSpec). At 100 TB the same call sites work unchanged over a partitioned
  * table root: partition pruning and DPP engage automatically because nothing
  * here materializes or caches eagerly.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events file's `ts` physical type has varied across driver data
    * generations — TIMESTAMP(NANOS) (read as a nanos BIGINT under
    * spark.sql.legacy.parquet.nanosAsLong=true, which Verify/Bench/test
    * harnesses set) and plain micros `timestamp[us]` with no timezone
    * (read as TIMESTAMP_NTZ). Normalize both here to a micros
    * TimestampType so every consumer sees one timestamp type. Both
    * branches are timezone-INDEPENDENT: nanos get floor division (exactly
    * what DuckDB does reading the same file), and NTZ recovers its stored
    * micros by pure local-datetime arithmetic (timestampdiff over NTZ
    * operands never consults the session zone — a plain
    * cast(ts as timestamp) would shift instants under any non-UTC
    * session). Shared by the batch loaders and
    * [[graft.streaming.StreamRunner.eventsStream]] so the two paths
    * cannot drift across data generations.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case Some(f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(
              "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = normalizeTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
