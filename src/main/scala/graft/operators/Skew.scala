package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §8): AQE's runtime skew-join split is the
  * first line of defense; these are the explicit-salting forms for the
  * cases AQE can't fix — a skewed AGGREGATION key (AQE only splits join
  * partitions) and a skewed join where the hot key is known up front.
  * Results are salt-invariant by construction: the salt only routes rows
  * to reducers (sums are associative over salts; the join replicates the
  * dim across every salt value), so ANY salt assignment — including a
  * retried task picking different values — produces identical output.
  */
object Skew {

  /** Two-phase aggregation for skewed group keys: first aggregate on
    * (key, salt) — spreading each hot key over `salts` reducers — then
    * merge the partials per key. `aggs` must be algebraic (sum/count/min/
    * max-style) for the merge to be exact; pass the partial->merge pair.
    *
    * Example: saltedSum(df, $"k", $"v", 16) == df.groupBy($"k").sum("v")
    * with the single hot-key reducer split 16 ways.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(monotonically_increasing_id()), lit(salts))
    df.select(key.as("k"), value.as("v"), salt.as("s"))
      .groupBy(col("k"), col("s"))
      .agg(sum(col("v")).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("total"))
  }

  /** Skewed fact ⋈ small-but-not-broadcastable dim: salt the fact side
    * with a deterministic per-row salt, replicate the dim side across all
    * `salts` values, and join on (key, salt) — each hot key now spreads
    * over `salts` reducers. Row multiplicity is preserved exactly (each
    * fact row joins its single replicated partner).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
          saltedFact("_salt") === replicatedDim("_salt"))
      .drop("_salt")
  }
}
