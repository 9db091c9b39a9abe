package org.apache.spark

/** Test-scope bridge to the package-private listener bus: probes that
  * tally per-query job counts (JobCountProbe, JobBudgetSpec) must drain
  * the ASYNC listener bus between queries or counts bleed across
  * boundaries. Same minimal-shim discipline as
  * [[org.apache.spark.sql.GraftSqlBridge]] — one forwarding call, no
  * behavior.
  */
object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
