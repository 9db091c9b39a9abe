package graft

/** The native kernels are reachable from SQL via function registration
  * (SparkSessionExtensions in production; direct registry here).
  */
class ExtensionsSpec extends SparkSpec {

  test("dot_product and l2_norm are callable from SQL and match the Column API") {
    GraftExtensions.registerFunctions(spark)
    Sql.register(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT vec_id, dot_product(embedding, embedding) AS d, l2_norm(embedding) AS n
         FROM embeddings ORDER BY vec_id LIMIT 20""").collect()
    import org.apache.spark.sql.functions._
    val viaCol = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        graft.operators.Vectors.dot(col("embedding"), col("embedding")).as("d"),
        graft.operators.Vectors.norm(col("embedding")).as("n"))
      .orderBy("vec_id").limit(20).collect()
    assert(viaSql.sameElements(viaCol))
  }

  test("arity errors are rejected") {
    GraftExtensions.registerFunctions(spark)
    intercept[Exception] {
      spark.sql("SELECT l2_norm()").collect()
    }
  }
}
