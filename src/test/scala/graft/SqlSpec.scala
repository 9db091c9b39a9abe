package graft

/** The SQL surface reaches every registered table through one planner. */
class SqlSpec extends SparkSpec {

  test("sql surface: aggregate over lineitem matches DataFrame result") {
    import org.apache.spark.sql.functions._
    val viaSql = Sql.run(spark, sfDir,
      """SELECT l_returnflag, COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
      .collect()
    val viaDf = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    assert(viaSql.sameElements(viaDf))
  }

  test("sql surface: caltopo feature view is queryable") {
    val n = Sql.run(spark, sfDir,
      "SELECT COUNT(*) FROM caltopo_features WHERE class = 'Folder'")
      .first().getLong(0)
    assert(n == 5)
  }

  test("sql surface: events/documents/embeddings registered, events ts typed") {
    val r = Sql.run(spark, sfDir,
      """SELECT (SELECT COUNT(*) FROM events) AS e,
                (SELECT COUNT(*) FROM documents) AS d,
                (SELECT COUNT(*) FROM embeddings) AS v""").first()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0 && r.getLong(2) > 0)
    // the view exposes the normalized TIMESTAMP, not the raw nanos BIGINT
    val tsType = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType
    assert(tsType == org.apache.spark.sql.types.TimestampType)
  }
}
