package graft

import org.apache.spark.sql.functions._

/** Fourth decade for `q_text_tfidf` (VERDICT r8 item 4): sf1000 documents
  * (50 M rows) on the reuse-enabled plan. Best-of-2, spin-marked, bench
  * partition sizing; after each run the POST-AQE executed plan's
  * Generate / ReusedExchange counts are printed so the "one tokenize
  * pass" claim (single Generate + ReusedExchange serving the df branch)
  * is re-verified at the scale being recorded, not assumed from sf100.
  *
  * Usage: SPARK_DRIVER_MEM=80g sbt "Test/runMain graft.TfidfDecadeProbe tmp/sf1000"
  */
object TfidfDecadeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("tmp/sf1000")
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
    Bench.spinMarkerMs(1000000L)
    val spinMs = Bench.spinMarkerMs()
    // initParts is derived and logged by ProbeSession (recomputing it here
    // would re-walk the whole data directory)
    val spark = ProbeSession.build(sfDir, "graft-tfidfdecade")
    println(f"[tfidfdecade] sfDir=$sfDir spin_ms=$spinMs%.0f")
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count() // warm
    println(s"[tfidfdecade] documents rows: $nDocs")
    // the write action runs its OWN QueryExecution — df.queryExecution
    // stays the unexecuted initial plan (AQE never finalizes it), so the
    // runtime reuse check must capture the executed plan via a listener
    val cap = new java.util.concurrent.atomic.AtomicReference[String](null)
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          cap.set(qe.executedPlan.toString)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    val times = (1 to runs).map { i =>
      val df = SparkEntry.queries("q_text_tfidf")(spark, sfDir)
      // latch, not a fixed sleep (ADVICE r9): the listener bus is async,
      // and under load a 2 s sleep could capture a STALE plan (e.g. the
      // warm-up count's) — clear before the write, spin until the write's
      // own onSuccess lands (bounded; a timeout prints an empty plan
      // rather than silently attributing the wrong execution)
      cap.set(null)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (cap.get() == null && System.nanoTime() < deadline)
        Thread.sleep(50)
      val p = Option(cap.get()).getOrElse("<listener capture timed out>")
      // executed Generates = Generate lines under live stages; the text
      // under a ReusedExchange reprints the ORIGINAL subtree (incl. its
      // Generate) without executing it, so count reuse nodes explicitly
      println(f"[tfidfdecade] run $i: $s%.1f s " +
        "REUSED=" + "ReusedExchange".r.findAllIn(p).size +
        " STAGES=" + "ShuffleQueryStage".r.findAllIn(p).size +
        " FINAL=" + p.contains("isFinalPlan=true"))
      System.gc()
      s
    }
    println(f"[tfidfdecade] CELL sf=$sfDir docs=$nDocs best=${times.min}%.1f s " +
      f"(runs ${times.map(t => f"$t%.1f").mkString("/")}) spin=$spinMs%.0f")
    spark.stop()
  }
}
