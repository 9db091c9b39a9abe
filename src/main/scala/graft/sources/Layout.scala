package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized bucketed layouts of the base tables — the 100 TB
  * shuffle-elision story made available to declared queries (r4 VERDICT
  * item 5): a table bucketed AND sorted on its join key sort-merge joins
  * against an equally-bucketed peer with NO Exchange on either side, so a
  * fact table that is joined on the same key by many queries pays its
  * shuffle ONCE at layout time instead of once per query.
  *
  * The layout is built on first use per (dir, table, key, buckets) and
  * registered as an external datasource table (explicit `path`, so no
  * dependence on the session's warehouse config); later calls — including
  * later bench runs in the same JVM — reuse it. The table name encodes the
  * source dir, so different scale factors never alias. This mirrors what a
  * production deployment does out-of-band (a nightly layout job); the cost
  * shows up in the first build and is amortized across every later join.
  */
object Layout {
  private val root = java.nio.file.Paths.get(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-layout")

  /** Bucketed+sorted variant of `$dir/$table.parquet` on `key`. */
  def bucketed(spark: SparkSession, dir: String, table: String,
      key: String, buckets: Int = 8): DataFrame = synchronized {
    val san = dir.replaceAll("[^A-Za-z0-9]", "_")
    val name = s"graft_${table}_by_${key}_b${buckets}_$san"
    if (!spark.catalog.tableExists(name)) {
      val path = root.resolve(name)
      // fresh JVM, stale directory from a previous run: the in-memory
      // catalog forgot the table but its files persist — clear them so
      // saveAsTable never mixes generations
      if (java.nio.file.Files.exists(path)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      Tables.load(spark, dir, table)
        .write.bucketBy(buckets, key).sortBy(key)
        .option("path", path.toString)
        .saveAsTable(name)
    }
    spark.table(name)
  }
}
