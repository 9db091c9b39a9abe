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
  * Mirrors [[Bench.main]]'s session: local[SPARK_GRAFT_CPUS|32] (probes
  * historically defaulted to 32 where Bench.main defaults to 4 under the
  * driver's explicit env — keep 32), shuffle.partitions = cores, AQE +
  * coalesce from [[Bench.dataSizedInitParts]] of the measured directory,
  * 32 MB advisory (the r6-measured optimum), UTC, nanos-as-long, graft
  * extensions, no UI — and the SAME env overrides Bench.main honors
  * (SPARK_GRAFT_SHUFFLE_INIT, SPARK_GRAFT_ADVISORY, SPARK_GRAFT_CONF), so
  * a documented A/B exported for a Bench-vs-probe pair applies to BOTH
  * arms. The derived initParts is logged once here — probes must not
  * recompute it (each call re-walks the data directory). `extra` lands
  * last so a probe can still pin its own local dir / state-store
  * provider on top (it wins over SPARK_GRAFT_CONF too — probe-structural
  * settings like the poller's local dir must not be overridable).
  */
object ProbeSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def build(sfDir: String, appName: String = "graft-probe",
      extra: Map[String, String] = Map.empty): SparkSession = {
    val c = cpus
    // A SHUFFLE_INIT override replaces the per-directory data-sized
    // derivation with ONE fixed start count — fine for a single-dir A/B,
    // but a multi-dir decade probe run under it sizes every directory's
    // shuffles from the same constant (ADVICE r11: exactly the skew the
    // per-dir derivation exists to eliminate). Tag it loudly so the
    // per-session log line can't be misread as the derived value.
    val initParts = sys.env.get("SPARK_GRAFT_SHUFFLE_INIT") match {
      case Some(v) =>
        println(s"[probesession] $appName OVERRIDE SPARK_GRAFT_SHUFFLE_INIT=$v" +
          " replaces the data-sized derivation (same fixed start for EVERY" +
          " directory this probe visits — unset it for multi-dir runs)")
        v
      case None => Bench.dataSizedInitParts(sfDir, c.toLong).toString
    }
    println(s"[probesession] $appName sfDir=$sfDir cpus=$c initParts=$initParts")
    // Window markers, printed with every probe session so scale cells are
    // classifiable from the probe log alone (VERDICT r12 item 2): the
    // fsmeta marker is the storm discriminator — the cold shuffle-file-
    // creation storm that swings sf10-class cells 2.5× is FS-journal
    // latency, invisible to the CPU/bandwidth markers — and membw_mt is
    // the aggregate-bandwidth host classifier. Same best-of-2-after-warm
    // discipline as Bench.main; ~0.3 s per session build.
    Bench.membwMtMarkerMs(threads = 4, passes = 1, words = 1 << 20) // JIT warm
    val mt = math.min(Bench.membwMtMarkerMs(), Bench.membwMtMarkerMs())
    Bench.fsmetaMarkerMs(files = 16) // page the FS code paths
    val fsm = math.min(Bench.fsmetaMarkerMs(), Bench.fsmetaMarkerMs())
    println(f"[probesession] $appName markers membw_mt_ms=$mt%.3f fsmeta_ms=$fsm%.3f")
    val builder = SparkSession.builder()
      .master(s"local[$c]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", c)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initParts)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "33554432"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach {
      _.split(";").map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    extra.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
