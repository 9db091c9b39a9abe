package graft
import graft.queries.Registry

/** Throwaway diagnostic main (not a spec); used while iterating on plan
  * shapes. Kept out of CI paths — safe to delete.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val q = Registry.all.find(_.name == "q_text_vocab").get
    val df = q.build(spark, "/root/testdata/sf0.01")
    println("=== optimized ===")
    println(df.queryExecution.optimizedPlan.toString)
    println("=== executed ===")
    println(df.queryExecution.executedPlan.toString)
    df.show(5, false)
    spark.stop()
  }
}
