package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** JSON string literal with quotes/backslashes escaped and control
    * characters flattened to spaces — failure messages pass through here
    * before landing in bench_full.json.
    */
  private[graft] def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"'            => "\\\""
      case '\\'           => "\\\\"
      case c if c < ' '   => " "
      case c              => c.toString
    } + "\""

  /** Compact head of a bench-run failure: exception class + the first
    * line of the ROOT cause's message (VERDICT r4 item 3: one r4 run died
    * with a DAGScheduler stack that best-of-N silently absorbed — a
    * recurring transient needs a name in the artifact, not just a
    * truncated stderr tail).
    */
  private[graft] def errorHead(e: Throwable): String = {
    var root = e
    while (root.getCause != null && (root.getCause ne root)) root = root.getCause
    val rootMsg = Option(root.getMessage).getOrElse("")
      .linesIterator.take(1).mkString.take(240)
    val cls = e.getClass.getSimpleName +
      (if (root ne e) s" <- ${root.getClass.getSimpleName}" else "")
    s"$cls: $rootMsg"
  }

  /** Host-contention marker (VERDICT r5 item 5): a FIXED amount of pure
    * single-threaded CPU work (an LCG fold — no allocation, no syscalls,
    * not eliminable), timed. ~1 s on an uncontended host of this class;
    * CPU steal / noisy neighbors inflate it proportionally, so a bench
    * run that landed in the host's documented ±15-40% slow band is
    * machine-identifiable from the published artifact alone instead of
    * needing cross-round adjudication. The value is published as
    * `spin_ms` in both the stdout JSON tail and bench_full.json.
    */
  private[graft] def spinMarkerMs(iters: Long = 600000000L): Double = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    val t0 = System.nanoTime()
    while (i < iters) {
      x = x * 6364136223846793005L + 1442695040888963407L
      i += 1
    }
    val ms = (System.nanoTime() - t0) / 1e6
    // publish the fold so the JIT cannot dead-code the loop
    if (x == 42L) System.err.println("spin collision")
    ms
  }

  /** Memory-bandwidth marker (r11): time a fixed number of sequential
    * passes over a fixed array that dwarfs the last-level cache, published
    * as `membw_ms` beside `spin_ms`. Motivation, measured on the r11 host
    * change: totals ran 15–30% HIGHER at ~10% FASTER spin — the host's
    * bottleneck had moved off the CPU onto the memory system, and the
    * artifact carried no signal to show it (spin normalization actually
    * over-corrected the wrong way). Shuffle-heavy Spark work is bandwidth-
    * bound far more than it is ALU-bound, so a run on a bandwidth-starved
    * host is identifiable only with this second marker. Measured quiet on
    * the r11 host: ~160–175 ms (passes × 256 MB = 1 GB traversed ≈ 6 GB/s
    * single-threaded — weak, and exactly the deficit the totals showed);
    * concurrent 16-thread load inflated it to ~335 ms. Contention or a
    * slower memory system inflates it proportionally. Not folded into
    * `value_normalized` — two correlated markers with unknown weights
    * would manufacture precision; the raw pair is what adjudication needs.
    */
  private[graft] def membwMarkerMs(passes: Int = 4,
      words: Int = 32 << 20): Double = {
    val a = new Array[Long](words) // 32 M longs = 256 MB >> any LLC
    var i = 0
    while (i < words) { a(i) = i.toLong; i += 1 }
    var s = 0L
    val t0 = System.nanoTime()
    var p = 0
    while (p < passes) {
      var j = 0
      while (j < words) { s += a(j); j += 1 }
      p += 1
    }
    val ms = (System.nanoTime() - t0) / 1e6
    // publish the fold so the JIT cannot dead-code the traversal
    if (s == 42L) System.err.println("membw collision")
    ms
  }

  /** Saturated (multi-thread) memory-bandwidth marker (VERDICT r11 item
    * 5): the same fixed traversal as [[membwMarkerMs]] run on a FIXED 16
    * threads at once over one shared 256 MB array, each thread starting
    * at its own stride offset and wrapping, so the concurrent streams
    * stay ~16 MB apart and cannot serve each other from the LLC.
    * Published as `membw_mt_ms` beside `membw_ms`: the single-stream
    * figure spots a weak memory SYSTEM per stream, but Spark's 32
    * concurrent tasks stress AGGREGATE bandwidth — measured r11, 16
    * threads of load inflated the single-thread marker ~2×, i.e. hosts
    * can be weak-single-stream but healthy-aggregate or vice versa, and
    * only the pair separates them. Thread count is fixed (not
    * availableProcessors) so the marker's work is host-invariant like
    * the other two. Aggregate GB/s ≈ 16 × 0.25 GB / (membw_mt_ms/1000).
    */
  private[graft] def membwMtMarkerMs(threads: Int = 16, passes: Int = 1,
      words: Int = 32 << 20): Double = {
    val a = new Array[Long](words)
    var i = 0
    while (i < words) { a(i) = i.toLong; i += 1 }
    val sum = new java.util.concurrent.atomic.AtomicLong
    val gate = new java.util.concurrent.CountDownLatch(1)
    val ts = (0 until threads).map { t =>
      val th = new Thread { override def run(): Unit = {
        val off = (words.toLong * t / threads).toInt
        gate.await()
        var s = 0L
        var p = 0
        while (p < passes) {
          var j = off
          while (j < words) { s += a(j); j += 1 }
          j = 0
          while (j < off) { s += a(j); j += 1 }
          p += 1
        }
        sum.addAndGet(s)
      } }
      th.setDaemon(true)
      th.start()
      th
    }
    val t0 = System.nanoTime()
    gate.countDown()
    ts.foreach(_.join())
    val ms = (System.nanoTime() - t0) / 1e6
    // publish the fold so the JIT cannot dead-code the traversals
    if (sum.get == 42L) System.err.println("membw_mt collision")
    ms
  }

  /** Per-query adaptive-retry priors (VERDICT r11 item 2): the fixed 4 s
    * retry floor stopped discriminating once the paired dedup family's
    * HEALTHY steady state crossed it (3.9–5.9 s at sf0.1) — every driver
    * run re-timed 2–4 fine queries and BASELINE.md had to adjudicate
    * "nretried 2–4" as the expected artifact shape. The threshold is now
    * per-query: `max(floor, 2 × prior(q))`, where `prior(q)` is the
    * query's recorded best cell from (a) `target/bench_full.json` — the
    * same-workspace history, freshest — and/or (b) the committed
    * reference resource `graft/bench-prior.json`; when both carry a
    * query the SMALLER prior wins (robust to one poisoned record). A
    * prior applies only when its `sf` basename matches the current
    * run's (an sf0.001 smoke must not inherit sf0.1 cells), and is
    * scaled UP by `membw_now / membw_recorded` when the current host's
    * bandwidth marker is weaker than the recording host's (the r10→r11
    * host flip inflated shuffle cells 2.5–4× at healthy CPU — an
    * unscaled fast-host prior would re-open the false-retry class on
    * the next weak host). No recorded prior ⇒ the floor alone, the old
    * behavior. An EXPLICIT SPARK_GRAFT_RETRY_SEC disables priors
    * entirely: the experimenter's A/B threshold applies verbatim
    * (forcing retries for debugging needs exactly that).
    */
  private[graft] def parsePriors(json: String, sfBase: String,
      membwNow: Double): Map[String, Double] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      val sf = Option(root.get("sf")).map(_.asText("")).getOrElse("")
      if (sf.split('/').last != sfBase) Map.empty
      else {
        val ref = Option(root.get("membw_ms")).map(_.asDouble(0.0)).getOrElse(0.0)
        val scale = if (ref > 0.0 && membwNow > ref) membwNow / ref else 1.0
        val qs = root.get("queries")
        if (qs == null) Map.empty
        else {
          val b = Map.newBuilder[String, Double]
          val it = qs.fields()
          while (it.hasNext) {
            val e = it.next()
            val v = e.getValue.asDouble(-1.0)
            if (v > 0.0) b += e.getKey -> v * scale
          }
          b.result()
        }
      }
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** The merged prior map for a run: workspace history ∧ committed
    * reference, per-query min (doc at [[parsePriors]]).
    */
  private[graft] def loadPriors(sfDir: String, membwNow: Double): Map[String, Double] = {
    val sfBase = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val hist =
      try {
        val p = java.nio.file.Paths.get("target/bench_full.json")
        if (java.nio.file.Files.exists(p))
          parsePriors(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"),
            sfBase, membwNow)
        else Map.empty[String, Double]
      } catch { case scala.util.control.NonFatal(_) => Map.empty[String, Double] }
    val res =
      try {
        val in = getClass.getResourceAsStream("/graft/bench-prior.json")
        if (in == null) Map.empty[String, Double]
        else
          try parsePriors(new String(in.readAllBytes(), "UTF-8"), sfBase, membwNow)
          finally in.close()
      } catch { case scala.util.control.NonFatal(_) => Map.empty[String, Double] }
    (hist.keySet ++ res.keySet).iterator.map { k =>
      k -> math.min(hist.getOrElse(k, Double.MaxValue),
        res.getOrElse(k, Double.MaxValue))
    }.toMap
  }

  /** Deny-filter for the one benign ERROR stack that kept polluting the
    * driver artifact's 2000-char stdout tail (VERDICT r11 item 3,
    * reproduced and named this round):
    *
    *   ERROR DAGScheduler: Failed to update accumulator N (Unknown class)
    *   org.apache.spark.SparkException: attempted to access non-existent
    *   accumulator N  (+ ~10 frames of DAGScheduler.updateAccumulators →
    *   handleTaskCompletion → EventLoop, repeated once per accumulator)
    *
    * Root cause, distinct from the r10 DropStats class (that one is fixed
    * at the source by the strong-retention ring, `Dedup.retained`): tasks
    * of an already-finished job — a limit-short-circuited `isEmpty`/
    * census count, or a cancelled AQE stage — drain their completion
    * events AFTER the query returned, while the inter-query `System.gc()`
    * (load-bearing: it releases each query's localCheckpoint blocks, the
    * q_percentile 4 s→22 s fix) has already collected SPARK'S OWN
    * per-plan SQL-metric and per-stage task-metric accumulators, which
    * AccumulatorContext only holds weakly. Those are Spark internals — no
    * graft-side strong ref can reach the per-stage ones — and the lost
    * update is metrics-only (correctness paths never read accumulators),
    * so the honest treatment is to suppress exactly this message and
    * COUNT the suppressions: the filter denies log events whose message
    * starts with the literal prefix, bumps `counter`, and stays NEUTRAL
    * for everything else — a genuine DAGScheduler failure still logs, and
    * still reaches the artifact through the thrown exception's
    * [[errorHead]] anyway. main() prints one summary line to stderr at
    * the end, so the artifact records THAT suppression happened without
    * 12-line stacks eating the tail window.
    */
  private[graft] def installLateAccumFilter(
      counter: java.util.concurrent.atomic.AtomicLong): Boolean =
    try {
      import org.apache.logging.log4j.LogManager
      import org.apache.logging.log4j.core.{Filter, LogEvent, LoggerContext}
      val f = new org.apache.logging.log4j.core.filter.AbstractFilter() {
        override def filter(e: LogEvent): Filter.Result = {
          val m = e.getMessage
          if (m != null && {
            val s = m.getFormattedMessage
            s != null && s.startsWith("Failed to update accumulator")
          }) { counter.incrementAndGet(); Filter.Result.DENY }
          else Filter.Result.NEUTRAL
        }
      }
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val cfg = ctx.getConfiguration
      // events route to the most specific LoggerConfig — cover them all
      cfg.getRootLogger.addFilter(f)
      cfg.getLoggers.values.forEach(_.addFilter(f))
      ctx.updateLoggers()
      true
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] late-accum filter not installed: $e")
      false
    }

  /** Spin-normalized total (VERDICT r6 item 4): `value × (1000/spin_ms)`,
    * scaling the measured wall total by how far the host's single-thread
    * CPU marker sat from its uncontended ~1 s reference — so cross-round
    * adjudication can compare totals without eyeballing `spin_ms`. LIMITS
    * (also documented in BASELINE.md): the spin measures CPU steal only,
    * not I/O or memory-bandwidth contention, and assumes slowdown scales
    * linearly with steal — treat the normalized value as a first-order
    * correction, not a clean-host measurement. A non-positive spin (clock
    * trouble) falls back to the raw value rather than dividing by it.
    */
  private[graft] def normalizedTotal(value: Double, spinMs: Double): Double =
    if (spinMs > 0.0) value * (1000.0 / spinMs) else value

  private def fmt(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** Data-sized AQE starting partition count: one shuffle partition per
    * ~32 MB of on-disk source bytes, floored at the core count, capped at
    * 32× cores (rationale at the use site in [[main]]). Shared with the
    * decade probes (r9 review: the recipe had been copy-pasted four
    * times — a change to the divisor or cap must land everywhere at once).
    */
  private[graft] def dataSizedInitParts(sfDir: String, cpus: Long): Long = {
    val dirBytes =
      try {
        val root = java.nio.file.Paths.get(sfDir)
        val s = java.nio.file.Files.walk(root)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      } catch { case scala.util.control.NonFatal(_) => 0L }
    math.min(math.max(dirBytes / (32L << 20), cpus), cpus * 32)
  }

  /** Ultra-compact whole-run record (VERDICT r7 item 6): total, query
    * count, retry count, spin + membw + membw_mt markers, normalized
    * total — ~190 chars (BenchJsonSpec bounds it at 240), no
    * per-query entries. Printed FIRST so the driver's 2 KB stdout tail
    * always captures one machine-readable line even when the per-query
    * line plus sbt's trailing "[success]" fills the rest of the window
    * (`BENCH_r{3..7}.json` all recorded `"parsed": null`). Both lines
    * together must stay under the window — [[perQueryBudget]] keeps the
    * long line's share down.
    */
  private[graft] def compactLine(total: Double, nq: Int, nretried: Int,
      spinMs: Double, membwMs: Double, membwMtMs: Double, sf: String): String =
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","nq":$nq,""" +
      s""""nretried":$nretried,"spin_ms":${fmt(spinMs)},""" +
      s""""membw_ms":${fmt(membwMs)},"membw_mt_ms":${fmt(membwMtMs)},""" +
      s""""value_normalized":${fmt(normalizedTotal(total, spinMs))},""" +
      // sfDir is environment input — escape it, or a quote/backslash in
      // the path breaks the very line that must always stay parseable
      s""""sf":${jsonString(sf)}}"""

  /** Character budget for the per-query stdout line: compact line (~190
    * post-membw_mt, bounded 240 by spec) + this + sbt's "[success] Total
    * time ..." tail (~40) must fit the driver's 2000-char window with
    * margin.
    */
  private[graft] val perQueryBudget = 1500

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // time the contention marker FIRST (after a short JIT warm pass), while
    // nothing else in this JVM competes with it
    spinMarkerMs(1000000L)
    val spinMs = spinMarkerMs()
    membwMarkerMs(passes = 1, words = 1 << 20) // JIT warm on a 8 MB array
    val membwMs = membwMarkerMs()
    membwMtMarkerMs(threads = 4, passes = 1, words = 1 << 20) // JIT warm
    // best-of-2: the first full-size call still carries ~25 ms of
    // tiered-JIT + fresh-allocation page-in residue (measured; the
    // single-thread markers amortize theirs over 4 passes)
    val membwMtMs = math.min(membwMtMarkerMs(), membwMtMarkerMs())
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle sizing that survives a scale-up (r5): a FIXED partition count
    // equal to the core count is right at sf0.1 (one wave, no scheduling
    // overhead) but becomes the bottleneck two decades up — at sf100 a
    // 600 M-row lineitem shuffle split 32 ways is ~19 M rows (~2 GB) per
    // partition, past what a task's share of execution memory can sort or
    // hash-aggregate without spilling (measured: TPC-H Q18's 150 M-group
    // aggregation ×112 per decade instead of ~linear). The fix is sized to
    // the DATA, not a bigger constant: AQE's starting partition count
    // derives from the input directory's on-disk bytes (one shuffle
    // partition per ~32 MB of source parquet, floored at the core count,
    // capped at 32× cores) and AQE coalesces small partitions back to the
    // advisory size at runtime. sf0.1 (~100 MB) keeps exactly the
    // core-count waves; sf100 (~16 GB) starts shuffles ~500-way so each
    // sort bucket fits a task's share of execution memory. (A fixed bigger
    // constant was measured statistically identical to cores at sf0.1 in
    // back-to-back full-surface runs — AQE coalescing absorbs the extra
    // initial partitions — but sizing to the data keeps the small-SF
    // driver config bit-identical to the recorded baseline posture while
    // still scaling the start count two decades up.) On a real cluster
    // the same derivation holds with executor count in place of cores.
    val initParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_INIT",
      dataSizedInitParts(sfDir, cpus.toLong).toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initParts)
      // AQE coalesce target 64 MB -> 32 MB (r6, measured at sf100): rows
      // in post-aggregate shuffles are far smaller than scan rows, so a
      // byte-sized advisory overpacks GROUPS per task — Q18's 150 M-group
      // first aggregate ran 111 s at 64 MB, 53 s at 32 MB, 274 s at
      // 256 MB (best-of-2, clean-host spin). 16 MB measured 59 s (past
      // the optimum), and the sf0.1 full surface is unchanged within the
      // host band at 32 MB.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "33554432"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf overrides for A/B experiments through the SAME
    // measurement protocol (e.g. SPARK_GRAFT_CONF=
    // "spark.sql.adaptive.advisoryPartitionSizeInBytes=268435456;k2=v2")
    sys.env.get("SPARK_GRAFT_CONF").foreach {
      _.split(";").map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // benign late-accumulator ERROR stacks must not eat the stdout tail
    // (VERDICT r11 item 3; doc at [[installLateAccumFilter]])
    val lateAccumSuppressed = new java.util.concurrent.atomic.AtomicLong
    installLateAccumFilter(lateAccumSuppressed)
    // Warm the session before timing: parquet footers/IO cache + the
    // scan codepaths, so the first measured query doesn't absorb one-time
    // session startup. The measured queries themselves run once, cold.
    // Per-table scale dirs (tools/sfcut.sh, ScaleGen subsets) hold only
    // the tables a measurement needs — probe existence first, or Spark's
    // FileStreamSink WARN logs a full stack trace per missing table
    // before the catch sees it (hundreds of noise lines per scale run).
    // probe through the Hadoop FS layer, not java.nio: the probe must see
    // every path Spark itself can read (hdfs://, s3a://, file:// URIs),
    // or a remote sfDir would silently skip the whole warm-up pass and
    // the first measured query would absorb the startup cost anyway
    // NonFatal only (r7 ADVICE): a fatal error here (OOM, interrupt) must
    // propagate, not masquerade as a silent warm-up skip that leaves a
    // genuinely broken FS config invisible — skips are logged by name.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val probed =
        try {
          val p = new org.apache.hadoop.fs.Path(sfDir, s"$t.parquet")
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] warm-up probe $t: $e")
          true // unprobeable -> let load try
        }
      if (probed)
        try graft.sources.Tables.load(spark, sfDir, t).count()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] warm-up skip $t: ${errorHead(e)}") }
    }
    // warm the execution machinery itself (Janino/codegen, window exec,
    // generators, hash aggregation, sort) on a tiny synthetic plan, so the
    // first measured query that touches each operator class doesn't absorb
    // its one-time compile cost
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      spark.range(1000)
        .withColumn("k", pmod(col("id"), lit(7)))
        .withColumn("arr", sequence(lit(0), pmod(col("id"), lit(3))))
        .withColumn("x", explode(col("arr")))
        .withColumn("rn", org.apache.spark.sql.functions.row_number()
          .over(Window.partitionBy("k").orderBy("id")))
        .groupBy("k").agg(count(lit(1)), sum(col("x")), min(col("rn")))
        .orderBy("k")
        .count()
      // operator classes the first plan doesn't touch, each of which costs
      // seconds of one-time Janino/codegen for whichever measured query
      // hits it first (r1: q_stream_session 13.4s vs 1.4s in isolation —
      // pure first-touch compile): session windows, pivot, broadcast
      // join, typed flatMap ser/de, JSON codecs, collect aggregates
      val tiny = spark.range(100)
        .withColumn("k", pmod(col("id"), lit(5)))
        .withColumn("ts", timestamp_micros(col("id") * 1000000L))
      tiny.groupBy(col("k"), session_window(col("ts"), "10 seconds"))
        .agg(count(lit(1))).count()
      tiny.groupBy(col("k"), window(col("ts"), "30 seconds", "10 seconds"))
        .agg(count(lit(1))).count()
      tiny.groupBy("k").pivot("k", Seq("0", "1")).agg(sum("id")).count()
      tiny.join(broadcast(tiny.select(col("k").as("k2")).limit(3)),
        col("k") === col("k2")).count()
      tiny.select(to_json(struct(col("id"), col("k"))).as("j"))
        .select(from_json(col("j"), "id BIGINT, k BIGINT",
          java.util.Collections.emptyMap[String, String]())).count()
      tiny.groupBy("k").agg(collect_list("id"), collect_set("id")).count()
      locally {
        import spark.implicits._
        tiny.select(col("id"), col("k")).as[(Long, Long)]
          .flatMap(t => Seq(t, t)).count()
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] codegen warm-up skipped: ${errorHead(e)}") }
    // Optional comma-separated query-name filter for profiling single
    // queries (e.g. SPARK_GRAFT_ONLY=q_dedup_clusters,q_text_tfidf).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    // Best-of-N per query (default 2): single runs swing ±40% on a
    // virtualized host (GC pauses, CPU steal, Janino compiles the warmup
    // can't reach); the minimum of repeated runs of deterministic work is
    // the standard low-noise estimator. SPARK_GRAFT_RUNS=1 for profiling.
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt.max(1)
    // Floor for the adaptive extra run (ADVICE r3: was hard-coded, and
    // the retries were invisible in the published JSON — both auditable
    // now). Per-query recorded priors lift it query-by-query (VERDICT
    // r11 item 2, doc at [[parsePriors]]); an explicit env value
    // suppresses the priors — it IS the experimenter's threshold.
    val retryEnv = sys.env.get("SPARK_GRAFT_RETRY_SEC")
    val retrySec = retryEnv.map(_.toDouble).getOrElse(4.0)
    val priors: Map[String, Double] =
      if (retryEnv.isDefined) Map.empty else loadPriors(sfDir, membwMs)
    def retryThreshold(name: String): Double =
      priors.get(name).map(p => math.max(retrySec, p * 2.0)).getOrElse(retrySec)
    val retriedNames = scala.collection.mutable.ArrayBuffer.empty[String]
    // per-failed-run exception heads (name -> class + first cause line),
    // published in bench_full.json so a transient that best-of-N absorbs
    // still leaves an auditable name in the artifact
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val results = selected.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // noop write forces FULL execution of every output column —
        // .count() let Catalyst prune unreferenced projections, so map-only
        // queries measured little more than scan+count (VERDICT r1 §wrong.6)
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failures += name -> errorHead(e)
          Double.NaN // a crash must never masquerade as a fast timing
        }
      }
      // release this query's localCheckpoint blocks: the ContextCleaner
      // frees them only after the driver-side RDD references are GC'd,
      // and accumulated blocks from earlier queries otherwise build heap
      // pressure that pathologically slows later buffer-heavy aggregates
      // (measured: q_percentile 4s early in the run, 22s late)
      System.gc()
      val ok = times.filterNot(_.isNaN)
      // Host contention can poison ALL scheduled runs of one query (the
      // driver's r2 record: q_dedup_minhash best-of-2 = 16.0s vs 1.6s
      // reproduced): when the best-of-N is still suspiciously slow, take
      // one extra measurement in the hope of a quieter window. min() of
      // more runs of deterministic work is still an honest estimator.
      val retried =
        if (ok.nonEmpty && ok.min > retryThreshold(name) && runs > 1) {
          retriedNames += name
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            ok :+ (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            failures += name -> errorHead(e); ok }
        } else ok
      name -> (if (retried.isEmpty) -1.0 else retried.min) // -1 marks a broken query
    }
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Full per-query detail — too long for the driver's 2000-char stdout
    // tail window (the r2 one-liner with all 89 queries at full precision
    // was truncated mid-line and failed to parse) — goes to a file.
    val fullJson = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val retriedJson = retriedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val failuresJson = failures.map { case (n, h) =>
      s"""{"q":${jsonString(n)},"error":${jsonString(h)}}"""
    }.mkString("[", ",", "]")
    // effective per-query thresholds for the RETRIED names (audit trail:
    // a retry that fired must be explainable from the artifact alone —
    // floor or 2× which prior)
    val thresholdsJson = retriedNames.map { n =>
      "\"" + n + "\":" + fmt(retryThreshold(n))
    }.mkString("{", ",", "}")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("target/bench_full.json"),
      s"""{"metric":"total","value":${fmt(total)},"value_normalized":${fmt(normalizedTotal(total, spinMs))},"unit":"sec","queries":$fullJson,"retried":$retriedJson,"retry_threshold_sec":$retrySec,"retry_priors_n":${priors.size},"retry_thresholds":$thresholdsJson,"failures":$failuresJson,"spin_ms":${fmt(spinMs)},"membw_ms":${fmt(membwMs)},"membw_mt_ms":${fmt(membwMtMs)},"sf":${jsonString(sfDir)}}"""
        .getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] full dump: $e") }
    // TWO stdout JSON lines, both inside the driver's 2 KB tail window:
    // first the ultra-compact whole-run record (always parseable — r7
    // item 6: every BENCH_r{3..7}.json landed `"parsed": null` because
    // the single budgeted line plus sbt's prefix chatter overflowed the
    // window), then the per-query detail line, budgeted so compact +
    // detail + sbt's trailing "[success] Total time ..." still fit.
    println(compactLine(total, results.size, retriedNames.size, spinMs,
      membwMs, membwMtMs, sfDir))
    val ordered = results.toSeq.sortBy { case (_, v) => (v >= 0, -v) }
    // stdout carries the retry COUNT (full names are in bench_full.json) so
    // the published total's measurement protocol is auditable per run
    val prefix = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","nq":${results.size},"nretried":${retriedNames.size},"queries":{"""
    // spin_ms + the spin-normalized total ride the suffix so they survive
    // the driver's tail window even when per-query entries fill the budget
    val suffix = s"""},"spin_ms":${fmt(spinMs)},"membw_ms":${fmt(membwMs)},"membw_mt_ms":${fmt(membwMtMs)},"value_normalized":${fmt(normalizedTotal(total, spinMs))},"sf":${jsonString(sfDir)}}"""
    var used = prefix.length + suffix.length
    val shown = scala.collection.mutable.ArrayBuffer.empty[String]
    ordered.foreach { case (k, v) =>
      val entry = "\"" + k + "\":" + fmt(v)
      if (used + entry.length + 1 <= perQueryBudget) { shown += entry; used += entry.length + 1 }
    }
    // one auditable line instead of N 12-line stacks (stderr — it must
    // never displace the two stdout JSON lines it exists to protect)
    if (lateAccumSuppressed.get > 0)
      System.err.println(s"[bench] suppressed ${lateAccumSuppressed.get} " +
        "late-accumulator ERROR logs (benign: completion events of " +
        "finished jobs' tasks draining after the inter-query GC)")
    println(prefix + shown.mkString(",") + suffix)
    spark.stop()
  }
}
