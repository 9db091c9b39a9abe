package graft

import org.apache.spark.sql.SparkSession

/** Throwaway plan-shape probe: prints scan/exchange/sort counts for one
  * query's physical plan (pre- and post-AQE). Test-scope tool, not part
  * of the declared surface.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_text_tfidf")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sf)
    def counts(p: String, tag: String): Unit = {
      println(s"$tag SCANS=" + "FileScan|BatchScan".r.findAllIn(p).size +
        " EXCH=" + raw"(?<!Reused)Exchange".r.findAllIn(p).size +
        " REUSED=" + "ReusedExchange".r.findAllIn(p).size +
        " SORTS=" + raw"\bSort\b".r.findAllIn(p).size +
        " WGL=" + "WindowGroupLimit".r.findAllIn(p).size)
    }
    counts(df.queryExecution.executedPlan.toString, "STATIC")
    df.write.format("noop").mode("overwrite").save()
    counts(df.queryExecution.executedPlan.toString, "FINAL")
    spark.stop()
  }
}
