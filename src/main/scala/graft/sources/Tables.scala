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

  /** Sessions must set spark.sql.legacy.parquet.nanosAsLong=true (Verify/
    * Bench/test harnesses do): the events file carries TIMESTAMP(NANOS),
    * which Spark reads as a nanos BIGINT under that flag. Normalize here to
    * a micros TimestampType (floor division — exactly what DuckDB does when
    * it reads the same file), so every consumer sees one timestamp type.
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
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
