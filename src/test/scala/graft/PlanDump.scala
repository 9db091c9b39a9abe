package graft
import graft.queries.Registry
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val names = Seq("flagship", "q_sql_tpch_q5", "q_sql_tpch_q18", "q_dedup_minhash",
      "q_knn_lsh", "q_percentile", "q_text_repetition", "q_pack_sequences",
      "q_stream_join", "q_event_retention", "q_text_tfidf", "q_dedup_clusters")
    val sb = new StringBuilder
    sb.append("# PLANS — headline physical plans (sf0.001, local[4]; key operator lines only)\n\n")
    sb.append("Generated from `queryExecution.executedPlan` (initial plan — AQE may further\n")
    sb.append("coalesce/replan at runtime). Lines filtered to joins, exchanges, aggregates,\n")
    sb.append("windows, generators, and scans — the operators that decide 100 TB behavior.\n")
    for (n <- names) {
      val q = Registry.all.find(_.name == n).get
      val plan = q.build(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      sb.append(s"\n## $n\n\n```\n")
      plan.split("\n").foreach { l =>
        val keep = Seq("Join", "Exchange", "HashAggregate", "ObjectHashAggregate",
          "SortAggregate", "Window", "Generate", "FileScan", "Scan", "TakeOrdered",
          "CollectMetrics", "Expand", "WindowGroupLimit", "BatchEvalPython", "Sort ")
          .exists(l.contains)
        if (keep) sb.append(l.take(160)).append("\n")
      }
      sb.append("```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
