package graft

import org.apache.spark.sql.SparkSession

/** The ONE place the measurement-session recipe lives (r11; closes the r9
  * review note that the data-sized-AQE recipe had been copy-pasted across
  * probes — and the r11 lesson that probes which SKIPPED it entirely are
  * not comparable to bench cells: JaccardScaleProbe measured the sf10
  * truth frame at 88.9 s under default AQE coalescing where the bench
  * config's data-sized start + 32 MB advisory ran the same subplan inside
  * a 47–51 s composed query — the defaults overpack shuffle partitions,
  * which this host's ~6 GB/s single-thread memory bandwidth punishes).
  *
  * Mirrors [[Bench.main]]'s session exactly: local[SPARK_GRAFT_CPUS|32]
  * (probes historically defaulted to 32 where Bench.main defaults to 4
  * under the driver's explicit env — keep 32), shuffle.partitions = cores,
  * AQE + coalesce from [[Bench.dataSizedInitParts]] of the measured
  * directory, 32 MB advisory (the r6-measured optimum), UTC, nanos-as-long,
  * graft extensions, no UI. `extra` lands last so a probe can still pin
  * its own local dir / state-store provider on top.
  */
object ProbeSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(sfDir: String, appName: String = "graft-probe",
      extra: Map[String, String] = Map.empty): SparkSession = {
    val c = cpus
    val builder = SparkSession.builder()
      .master(s"local[$c]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", c)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Bench.dataSizedInitParts(sfDir, c.toLong).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "33554432")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
