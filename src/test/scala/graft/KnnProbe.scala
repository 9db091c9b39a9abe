package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch stage-timing probe for knnLshDeduped at scale — not a spec.
  *
  * The hand-inlined stage cells below are DELIBERATELY the r7 shape
  * (member-level cross/own expansion ranked by a member-scale window):
  * they are the A/B baseline whose attribution (r8) showed the final
  * window dominating (74 s over a 620 M-row shuffle at sf1000) and the
  * groups aggregate — the old scaladoc's byte-shrink candidate — costing
  * 1.3–1.9 s. The "full noop write" cells call the REAL operator, i.e.
  * the r8 rep-level-ranked array-expansion shape, in the same JVM.
  *
  * Usage: SPARK_DRIVER_MEM=80g sbt "Test/runMain graft.KnnProbe tmp/sf100"
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "500")
      .config("spark.sql.extensions",
        sys.env.getOrElse("PROBE_EXTENSIONS", ""))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def timed[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $what: ${(System.nanoTime() - t0) / 1e9}%.1f s -> $r")
      r
    }
    val k = 5
    val hashed = emb.select(col("vec_id"), col("embedding"),
      xxhash64(col("embedding")).as("eh"))
    val groups = hashed.groupBy(col("eh"), col("embedding"))
      .agg(graft.functions.BottomIds(k + 1)(col("vec_id")).as("low_ids"))
      .select(col("eh"), col("embedding"),
        element_at(col("low_ids"), 1).as("rep"), col("low_ids"))
      .localCheckpoint(false)
    timed("groups materialize")(groups.count())
    val reps = groups.select(col("rep").as("vec_id"), col("embedding"))
    val members = hashed
      .join(groups.select(col("eh"), col("embedding").as("gemb"), col("rep")),
        Seq("eh"))
      .filter(col("embedding") === col("gemb"))
      .select(col("rep"), col("vec_id").as("member"))
      .localCheckpoint(false)
    println("[probe] members plan:\n" + members.queryExecution.executedPlan.toString)
    timed("members materialize")(members.count())
    val lowArr = groups.select(col("rep"), col("low_ids"))
    timed("lowArr")(lowArr.count())
    // candidate pipeline on reps only
    val cands = {
      val withBucket = reps
        .select(col("vec_id"),
          posexplode(graft.functions.VectorExprs.lshBuckets(col("embedding"), 6, 8))
            .as(Seq("t", "bucket")))
      val a = withBucket.select(col("vec_id").as("id_a"),
        col("t").as("t_a"), col("bucket").as("bucket_a"))
      val b = withBucket.select(col("vec_id").as("id_b"),
        col("t").as("t_b"), col("bucket").as("bucket_b"))
      val pairs = a.join(b,
          col("t_a") === col("t_b") && col("bucket_a") === col("bucket_b") &&
            col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b")
      val embA = reps.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
      val embB = reps.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
      pairs.join(embB, "id_b").join(embA, "id_a")
        .select(col("id_a"), col("id_b"),
          (graft.operators.Vectors.dot(col("emb_a"), col("emb_b")) /
            (graft.operators.Vectors.norm(col("emb_a")) *
             graft.operators.Vectors.norm(col("emb_b")))).as("cos_sim"))
    }
    timed("candidates")(cands.count())
    val wg = Window.partitionBy(col("id_a"))
      .orderBy(col("cos_sim").desc, col("id_b").asc)
    val topGroups = cands
      .withColumn("grn", row_number().over(wg))
      .filter(col("grn") <= k)
      .drop("grn")
    timed("topGroups")(topGroups.count())
    val aMembers = members.select(col("rep").as("id_a"), col("member").as("ma"))
    val bMeta = lowArr.select(col("rep").as("id_b"),
      slice(col("low_ids"), 1, k).as("b_ids"))
    val cross = topGroups.join(bMeta, "id_b").join(aMembers, "id_a")
      .select(col("ma").as("id_a"),
        explode(col("b_ids")).as("id_b"), col("cos_sim"))
    timed("cross")(cross.count())
    val selfSim = reps.select(col("vec_id").as("rep"),
      (graft.operators.Vectors.dot(col("embedding"), col("embedding")) /
        (graft.operators.Vectors.norm(col("embedding")) *
         graft.operators.Vectors.norm(col("embedding")))).as("cos_sim"))
    val own = members.select(col("rep"), col("member").as("id_a"))
      .join(lowArr.filter(size(col("low_ids")) >= 2), "rep")
      .join(selfSim, "rep")
      .select(col("id_a"),
        explode(filter(col("low_ids"), x => x =!= col("id_a"))).as("id_b"),
        col("cos_sim"))
    timed("own")(own.count())
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("cos_sim").desc, col("id_b"))
    val fin = cross.unionByName(own).withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
    timed("final topK (count)")(fin.count())
    timed("full noop write") {
      graft.operators.Vectors.knnLshDeduped(emb, k)
        .write.format("noop").mode("overwrite").save(); 1
    }
    timed("full noop write + orderBy (registered query shape)") {
      graft.operators.Vectors.knnLshDeduped(emb, k)
        .orderBy("id_a", "id_b")
        .write.format("noop").mode("overwrite").save(); 1
    }
    spark.stop()
  }
}
