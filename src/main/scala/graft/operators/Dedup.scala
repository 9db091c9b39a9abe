package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for LLM training-data pipelines (SURVEY.md §2
  * B20). Everything is built from codegen'd built-ins — no UDFs — so the hot
  * path stays inside whole-stage codegen and scales by partitioning alone:
  *
  *  - exact:   hash-groupBy on normalized text (one shuffle on the hash).
  *  - minhash: shingle -> 64 minhashes -> LSH bands -> candidate pairs via a
  *             self-equi-join on (band_id, band_hash). At 100 TB the band
  *             join is the only shuffle and its key space is uniform by
  *             construction (hashes); the quadratic blowup inside a bucket
  *             is bounded because equal band-hashes imply near-identical
  *             docs (AQE skew-join splits any residual hot bucket).
  *  - simhash: 64-bit sign-aggregated fingerprint, banded into 4x16-bit
  *             chunks for Hamming-near candidate generation.
  *
  * Determinism: all hashing is Spark's xxhash64 (seed fixed) — stable across
  * runs/partitionings; pair outputs are canonically ordered (id_a < id_b).
  */
object Dedup {

  /** SQL shiftright with a column shift amount (the typed API only accepts
    * Int literals; inside HOF lambdas the amount is a lambda variable).
    */
  private def shr(e: Column, n: Column): Column =
    call_function("shiftright", e, n)
  private def shl(e: Column, n: Column): Column =
    call_function("shiftleft", e, n)

  /** Lowercased, whitespace-split, empty-dropped words of a text column. */
  def words(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => length(w) > 0)

  /** w-word shingles of a words array (distinct), as strings. */
  def shingles(ws: Column, w: Int = 3): Column = {
    val n = size(ws)
    array_distinct(
      when(n >= w,
        transform(sequence(lit(0), n - w),
          i => array_join(slice(ws, i + 1, lit(w)), " ")))
        .otherwise(array(array_join(ws, " "))))
  }

  /** numPerm minhash values: min over shingles of xxhash64(shingle, perm).
    * NOTE: as a single nested-HOF expression Catalyst's CollapseProject
    * re-inlines the shingling work into all numPerm branches (measured 50x
    * slowdown) — [[minhashSignatures]] is the production path: explode
    * shingles to rows and take numPerm min-aggregates, so each shingle is
    * hashed exactly once and the aggregation is map-side partial.
    */
  def minhashes(sh: Column, numPerm: Int = 64): Column =
    transform(sequence(lit(0), lit(numPerm - 1)),
      p => array_min(transform(sh, s => xxhash64(s, p))))

  /** (id, mh) signature table: shingle rows -> numPerm min(xxhash64(s, p))
    * aggregates packed back into one array column. One shuffle on id with
    * map-side combine — the shape that survives 100 TB.
    */
  def minhashSignatures(docs: DataFrame, numPerm: Int = 64): DataFrame =
    docs.select(col("id"),
        explode(shingles(words(col("text")))).as("s"))
      .groupBy(col("id"))
      .agg(array((0 until numPerm).map(p => min(xxhash64(col("s"), lit(p)))): _*)
        .as("mh"))

  /** LSH band keys: split the signature into bands of `rows` values and hash
    * each band; a shared (band index, band hash) pair => candidate pair.
    */
  def bandKeys(mh: Column, rows: Int = 4): Column =
    transform(sequence(lit(0), (size(mh) / lit(rows)).cast("int") - 1),
      b => struct(b.as("band"),
        xxhash64(array_join(slice(mh, b * rows + 1, lit(rows)), ",")).as("bh")))

  /** Candidate near-dup pairs (id_a < id_b) whose estimated Jaccard (equal
    * minhash fraction) is >= threshold. `docs` must have (id, text).
    */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.5,
      numPerm: Int = 64, bandRows: Int = 4): DataFrame = {
    val sigs = minhashSignatures(docs, numPerm)
      .withColumn("bk", explode(bandKeys(col("mh"), bandRows)))
    val a = sigs.select(col("id").as("id_a"), col("mh").as("mh_a"),
      col("bk").as("bk_a"))
    val b = sigs.select(col("id").as("id_b"), col("mh").as("mh_b"),
      col("bk").as("bk_b"))
    val estJaccard = aggregate(
      zip_with(col("mh_a"), col("mh_b"),
        (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
      lit(0), (acc, v) => acc + v).cast("double") / numPerm
    a.join(b, col("bk_a") === col("bk_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), estJaccard.as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** 64-bit SimHash of the word multiset: bit b is set when the sum of
    * per-word contributions (+1 when bit b of xxhash64(word) is 1 else -1)
    * is positive. Expressed as a fold over a 64-long counter array.
    */
  def simhash(ws: Column): Column = {
    val bits = sequence(lit(0), lit(63))
    val counters = aggregate(
      transform(ws, w => xxhash64(w)),
      transform(bits, _ => lit(0)),
      (acc, h) => zip_with(acc, bits,
        (c, b) => c + when(shr(h, b).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(counters, bits,
        (c, b) => when(c > 0, shl(lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Candidate pairs within Hamming distance `maxDist` of each other's
    * simhash, generated by banding the 64 bits into 4 16-bit chunks (any
    * pair at distance <= 3 shares at least one intact chunk); exact Hamming
    * distance (bit_count of XOR) filters the candidates.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val sigs = docs.select(col("id"), simhash(words(col("text"))).as("sh"))
      .withColumn("chunk", explode(transform(sequence(lit(0), lit(3)),
        c => struct(c.as("ci"),
          shr(col("sh"), c * 16).bitwiseAND(0xFFFFL).as("cv")))))
    val a = sigs.select(col("id").as("id_a"), col("sh").as("sh_a"),
      col("chunk").as("chunk_a"))
    val b = sigs.select(col("id").as("id_b"), col("sh").as("sh_b"),
      col("chunk").as("chunk_b"))
    a.join(b, col("chunk_a") === col("chunk_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("id_a", "id_b")
  }
}
