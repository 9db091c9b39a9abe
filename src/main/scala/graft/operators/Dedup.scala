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

  /** Max-tracking accumulator (LongAccumulator only sums). */
  final class MaxAccumulator
      extends org.apache.spark.util.AccumulatorV2[Long, Long] {
    private var _max = 0L
    override def isZero: Boolean = _max == 0L
    override def copy(): MaxAccumulator = {
      val c = new MaxAccumulator; c._max = _max; c
    }
    override def reset(): Unit = _max = 0L
    override def add(v: Long): Unit = _max = math.max(_max, v)
    override def merge(o: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit =
      _max = math.max(_max, o.value)
    override def value: Long = _max
  }

  /** Live counters for the `maxBucket` recall trade of [[minhashPairs]] /
    * [[simhashPairs]] — named accumulators, so they surface in the Spark
    * UI / listener events automatically and survive AQE's plan cloning
    * (a CollectMetrics/observe() node was measured losing its values or
    * vanishing entirely under AQE re-optimization). Values are
    * best-effort upper bounds under task retries/speculation — the same
    * caveat as Spark's own SQL metrics.
    *
    * CONTRACT (ADVICE r3): counts are valid for exactly ONE evaluation of
    * the returned DataFrame. The bumping UDF lives in the plan, so every
    * additional action on the result — or a downstream plan that
    * re-executes the branch (an uncached self-join, a recomputed
    * subplan) — adds another full pass to every counter. Callers that
    * need counts alongside multiple actions must checkpoint/cache the
    * returned frame first, or re-create fresh counters per action via
    * [[dropStats]]. Correctness paths never read these counters.
    */
  final class DropStats(
      val droppedBuckets: org.apache.spark.util.LongAccumulator,
      val droppedMembers: org.apache.spark.util.LongAccumulator,
      val largestBucket: MaxAccumulator) extends Serializable

  /** Strong references to the most recent drop-counter sets.
    * AccumulatorContext only holds registered accumulators WEAKLY, so once
    * a caller releases its plan and the driver GCs (Bench runs System.gc()
    * between queries), a LATE task-completion event — cancelled tasks of a
    * limit-short-circuited or retried job draining after the query
    * returned — can find its accumulator already collected, and the
    * DAGScheduler event loop logs a full garbage-collected-accumulator
    * stack (VERDICT r10 item 3: that stack polluted the driver bench
    * artifact's 2000-char stdout tail under contention). Retaining the
    * last `RetainStats` sets keeps the ids resolvable until any straggler
    * event drains — the update lands harmlessly — while the ring bounds
    * memory for long-lived sessions (3 tiny accumulators per entry; 4096
    * queries of slack is far beyond any in-flight event window).
    */
  private val RetainStats = 4096
  private val retained = new java.util.ArrayDeque[DropStats](16)

  /** Fresh named drop counters registered on `spark`'s context. */
  def dropStats(spark: org.apache.spark.sql.SparkSession,
      label: String): DropStats = {
    val sc = spark.sparkContext
    val lb = new MaxAccumulator
    sc.register(lb, s"graft.dedup.$label.largest_bucket")
    val st = new DropStats(
      sc.longAccumulator(s"graft.dedup.$label.dropped_buckets"),
      sc.longAccumulator(s"graft.dedup.$label.dropped_members"),
      lb)
    retained.synchronized {
      retained.addLast(st)
      if (retained.size > RetainStats) retained.removeFirst()
    }
    st
  }

  /** Filter `buckets` to sizes in [2, maxBucket], bumping the drop
    * counters once per evaluated bucket. The counting UDF is materialized
    * in its own projection and the filter references the ATTRIBUTE —
    * `countingUdf(...).between(lo, hi)` would expand the UDF into both
    * conjuncts and (being nondeterministic, hence excluded from
    * subexpression elimination) execute the side effect twice per bucket,
    * doubling every reported count. Nondeterminism also stops the
    * optimizer collapsing the projection into the filter. A scalar UDF
    * off the codegen path — but it runs once per BUCKET (post-aggregation;
    * |buckets| rows, not |corpus|), so the hot path is untouched.
    */
  private def filterCounting(buckets: DataFrame, st: DropStats,
      maxBucket: Int): DataFrame = {
    // close over the accumulators directly — they serialize into tasks
    val (db, dm, lb) = (st.droppedBuckets, st.droppedMembers, st.largestBucket)
    val mb = maxBucket
    val f = udf((n: Int) => {
      if (n > mb) { db.add(1L); dm.add(n.toLong) }
      lb.add(n.toLong)
      n
    }).asNondeterministic()
    buckets.withColumn("_sz", f(size(col("members"))))
      .filter(col("_sz").between(2, maxBucket))
      .drop("_sz")
  }

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

  /** (id, g): per-doc DISTINCT gram-hash arrays, computed entirely
    * row-locally — ZERO shuffles (r11; replaces the explode +
    * lead()-window shape, which shuffled EVERY gram occurrence by id
    * just to line up consecutive word hashes — the ~21.5 GB sort spill
    * of the sf100 truth-frame cell was exactly that exchange). The gram
    * pass is the native [[graft.functions.TextExprs.gramHashes]] kernel:
    * each word hashed once, a gram's hash the fixed-width combination of
    * the 3 consecutive word hashes, no gram STRING ever built, one tight
    * codegen'd loop per doc (the HOF transform()/element_at formulation
    * kept the values but ran interpreted — measured 2–12× slower
    * depending on how the optimizer duplicated it; rationale at the
    * kernel). Values are IDENTICAL to the window shape's (same xxhash64
    * compositions; GramHashSpec pins the per-row equality, PropertySpec
    * the brute-force jaccard, and all oracle rows are unchanged): docs
    * >= 3 words get their word trigram hashes, shorter docs one
    * whole-text gram (mirrors [[shingles]]' degenerate case), null/blank
    * texts are absent — matching the old aggregate's no-rows-no-group
    * domain. Hashing is injective-in-practice (64-bit), so set sizes and
    * intersections over hashes equal those over the gram strings.
    *
    * The blank filter runs on trim(text) — cheap and pushdown-safe; a
    * size(g) > 0 filter instead would let predicate pushdown substitute
    * the gram kernel into the filter and evaluate it twice per row.
    */
  def gramHashSets(docs: DataFrame): DataFrame =
    docs.filter(trim(coalesce(col("text"), lit(""))) =!= "")
      .select(col("id"),
        graft.functions.TextExprs.gramHashes(col("text")).as("g"))

  /** Distinct (id, h) gram-hash rows — the gram kernel exploded. The
    * generator input is the EXPRESSION, not a bound alias: explode over
    * an aliased gram column makes InferFiltersFromGenerate add a
    * size>0/isnotnull filter whose pushdown substitutes the whole gram
    * subtree into the filter — evaluating the kernel twice per row (and
    * it put the O(n²) HOF form in front of the parquet scan as a
    * DataFilter; the rule skips inference for non-cheap generator
    * inputs). The explode is row-local (a doc's grams never leave their
    * input partition), so downstream per-doc aggregates
    * ([[minhashSignatures]]) partial-aggregate each doc to ONE row
    * map-side and the only shuffle left is doc-sized, not
    * gram-occurrence-sized.
    */
  def shingleHashRows(docs: DataFrame): DataFrame =
    docs.filter(trim(coalesce(col("text"), lit(""))) =!= "")
      .select(col("id"),
        explode(graft.functions.TextExprs.gramHashes(col("text"))).as("h"))

  /** Exact word-trigram Jaccard pairs inside a doc-id blocking window —
    * the SQL-expressible exact near-dup shape (`q_dedup_ngram_jaccard`,
    * and since r10 the declared truth frame of the minhash/simhash pair
    * queries). Grams are 64-bit hashes, never gram strings — 1-1 with
    * string trigrams on this corpus (TextSpec asserts the preconditions),
    * so intersection/set sizes and therefore jaccard are bitwise-equal to
    * a string-gram oracle.
    *
    * Shape: an INVERTED-INDEX self-equi-join on (gram hash, id BLOCK) —
    * the classic exact set-similarity join with the blocking window
    * folded INTO the join key. `|a ∩ b|` is the per-pair count of
    * matching gram rows, so no gram array is ever materialized or
    * intersected, and pairs sharing zero grams (the overwhelming bulk of
    * a window: 91% on this corpus) never exist at all. The first r10 form
    * exploded every in-window id and array_intersect'ed full gram sets —
    * O(window × corpus) intersect calls put q_dedup_minhash at 5.1 s
    * (sf0.1); the plain hash-only join that replaced it was measured 3.2×
    * cheaper there but left the window as a RESIDUAL filter, so a
    * duplication-heavy corpus (sf100's 1000 identical copies per text)
    * still paid O(df²) hash-matched candidates per gram before the filter
    * dropped them. Folding `floor(id/window)` into the key (the a-side
    * explodes to its own and the next block; an in-window pair lands in
    * exactly one of the two) bounds in-bucket work to the ids inside a
    * 2×window span SHARING THE GRAM — O(window) per occurrence even for
    * a stop gram shared by every doc, duplication-immune by construction.
    * `docs` must have (id, text); output (id_a, id_b, jaccard), unordered.
    */
  def exactJaccardWindowPairs(docs: DataFrame, tau: Double,
      window: Int, materialize: Boolean = true): DataFrame = {
    // What's materialized ONCE is the PER-DOC GRAM ARRAY frame (r11) —
    // one row per doc, array-encoded longs, no id repeated per gram —
    // not the exploded (id, h) rows the r10 form checkpointed. Both join
    // sides and the sizes projection read it; consumers explode
    // ROW-LOCALLY from the checkpoint, so the gram-occurrence shuffle
    // that dominated the sf100 cell (the r10 shape's lead()-window
    // needed every gram row shuffled by id BEFORE the checkpoint;
    // TruthFrameDiskProbe measured ~21.5 GB of sort spill that was
    // exactly that exchange) is gone, and `sizes` is a plain size(g)
    // projection — the per-doc count aggregate and its shuffle with it.
    // EAGER since r12: a lazy checkpoint here is NOT materialized once —
    // AQE submits the join's a-side and b-side map stages together, they
    // RACE to compute the lazy checkpoint's partitions, and each runs
    // the full gram kernel for blocks the other also computes (the
    // losing store is discarded — the `Block rdd_N already exists`
    // warnings every truth construct logged). TruthArrProbe,
    // order-controlled A/B at sf10: eager 9.5 s warm-min vs lazy
    // 11.6 s, and 13.3 vs 58.2 s in a cold-FS window (the race doubles
    // exactly the file-create-storm-prone work this host class hates).
    // The price is one dedicated driver round-trip per truth construct
    // (~tens of ms; JobBudgetSpec ceilings re-recorded deliberately).
    // The `materialize = false` arm recomputes the gram subplan per
    // consumer (the disk-posture A/B, VERDICT r10 item 4; its r10
    // numbers: recompute 1.7× the wall at identical peak disk — re-run
    // post-rewrite in BASELINE.md r11).
    val arrPlan = gramHashSets(docs)
    val arr = if (materialize) arrPlan.localCheckpoint(true) else arrPlan
    exactJaccardWindowPairsArr(arr, tau, window)
  }

  /** [[exactJaccardWindowPairs]] over a CALLER-SUPPLIED per-doc gram-array
    * frame (the [[gramHashSets]] shape, normally checkpointed by the
    * caller) — r14: the oracle-paired dedup queries build a truth frame
    * AND a candidate pipeline over the SAME corpus, and both need the
    * gram kernel; sharing one checkpointed gram frame removes a full
    * corpus scan + kernel pass per query (at 100 TB: one whole read of
    * the corpus). Values are unchanged — the kernel output is
    * deterministic, so pairs from a shared frame are bitwise-identical
    * to pairs from a private one.
    */
  def exactJaccardWindowPairsArr(arr: DataFrame, tau: Double,
      window: Int): DataFrame = {
    val sizes = arr.select(col("id"), size(col("g")).as("n"))
    val rows = arr.select(col("id"), explode(col("g")).as("h"))
    val blk = floor(col("id") / window).cast("long")
    // a-side rows carry (own block, next block): pair (a,b) with
    // a < b ≤ a+window has floor(b/w) ∈ {floor(a/w), floor(a/w)+1} and
    // matches on exactly ONE of the two (blk_b is single-valued), so no
    // pair dedup is needed
    val inter = rows
      .select(col("id").as("id_a"), col("h"),
        explode(array(blk, blk + 1)).as("blk"))
      .join(rows.select(col("id").as("id_b"), col("h"), blk.as("blk")),
        Seq("h", "blk"))
      .filter(col("id_b") > col("id_a") &&
        col("id_b") <= col("id_a") + window)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /** Truth rows + a genuine recall flag of a candidate pair set — the
    * dedup-pair arm of the exact-plus-genuine-flag oracle pattern
    * (`Vectors.withRecallFlag` is the bounded-sample kNN arm; THIS shape
    * avoids its single-partition window because a corpus-blocking truth
    * frame is O(corpus) rows, not probes × k). The marked join is
    * lazy-checkpointed so the truth and candidate subplans execute once,
    * and the scalar flag rides back on a broadcast single-row crossJoin
    * (the tfidf/vocab count pattern). `candidates` must be unique per
    * (id_a, id_b) — true of minhashPairs/simhashPairs' dropDuplicates
    * outputs. Empty truth ⇒ zero output rows (the flag is vacuous).
    */
  def withPairRecallFlag(truth: DataFrame, candidates: DataFrame,
      bound: Double, name: String): DataFrame = {
    val marked = truth.join(
        candidates.select(col("id_a"), col("id_b"), lit(1).as("__hit")),
        Seq("id_a", "id_b"), "left")
      .localCheckpoint(false)
    val flag = marked.agg(
      (count(col("__hit")) >=
        count(lit(1)).cast("double") * lit(bound)).as(name))
    marked.drop("__hit").crossJoin(broadcast(flag))
  }

  /** Single-row cluster-agreement flag of a cluster `assignment` against
    * a `truth` pair frame: TRUE when ≥ `bound` of the truth pairs get the
    * same assignment cluster on both endpoints (null-safe =: an endpoint
    * missing from the assignment compares unequal, counting against the
    * bound — the genuine-risk arm of the oracle pattern). The assignment
    * side is RESTRICTED to the ids the truth frame mentions before the
    * two endpoint joins, via a census-gated broadcast left-semi: the
    * truth frame is pairs-sized (×10/decade by construction at the
    * declared blocking window) while the assignment is CORPUS-sized on a
    * duplication-adversarial corpus (with d copies of every text, every
    * doc sits in an exact clique, so every doc carries a label — at sf100
    * that is 5 M assignment rows against 21 k truth pairs). The r11 query
    * shape joined the full assignment twice — two corpus-sized shuffle
    * joins plus a corpus-sized caller checkpoint, probe-attributed this
    * round as the ×1.4/decade excess of `q_dedup_clusters_exact_first`
    * over its additive-linear sibling (VERDICT r11 item 1). A left join
    * only ever READS assignment rows at truth ids, so the restriction is
    * value-identical (DedupSpec pins it against the unrestricted form).
    *
    * `truth` must expose (id_a, id_b) and should be checkpointed by the
    * caller (it usually also feeds the declared CC). `assignment` must
    * expose (id, cluster) and needs NO caller-side checkpoint: the
    * restricted frame is checkpointed here and is the assignment's only
    * consumer, so its subplan — including [[clustersExactFirst]]'s
    * corpus-wide expansion join — still executes exactly once.
    */
  def clusterAgreementFlag(truth: DataFrame, assignment: DataFrame,
      bound: Double, name: String,
      broadcastCap: Long = 1L << 22,
      truthPairs: Option[Long] = None): DataFrame = {
    // the shared endpoint-join + agg tail: `small` must expose
    // (id, cluster); `bc` decides whether the endpoint sides broadcast
    def flagOver(small: DataFrame, bc: Boolean): DataFrame = {
      def endpoint(df: DataFrame): DataFrame = if (bc) broadcast(df) else df
      truth
        .join(endpoint(small.select(col("id").as("id_a"), col("cluster").as("__ca"))),
          Seq("id_a"), "left")
        .join(endpoint(small.select(col("id").as("id_b"), col("cluster").as("__cb"))),
          Seq("id_b"), "left")
        .agg((count(when(col("__ca") === col("__cb"), 1)) >=
          count(lit(1)).cast("double") * lit(bound)).as(name))
    }
    // r15, VERDICT r14 item 1 (LocalRelation-gated censuses): clusters()'
    // driver union-find route returns a LocalRelation whose exact row
    // count is driver-resident — ZERO jobs to read it. When it fits the
    // cap, the semi-join restriction (whose only purpose is shrinking a
    // CORPUS-sized distributed assignment) and BOTH censuses are skipped
    // and the endpoint joins broadcast the assignment directly. A left
    // join reads the same assignment rows either way, so the flag is
    // value-identical (the restriction itself was pinned value-identical
    // to the unrestricted form; DedupSpec pins this path against the
    // census-gated one). The LocalRelation is literal driver data: two
    // consumers re-read rows, never a subplan.
    val localRows: Option[Long] = {
      import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
      assignment.queryExecution.analyzed match {
        case l: LocalRelation             => Some(l.data.size.toLong)
        case Project(_, l: LocalRelation) => Some(l.data.size.toLong)
        case _                            => None
      }
    }
    if (localRows.exists(_ <= broadcastCap)) return flagOver(assignment, bc = true)
    val tidsPlan = truth.select(col("id_a").as("id"))
      .union(truth.select(col("id_b").as("id")))
      .distinct()
    // census-gated broadcast (the keepIds discipline): tids descends from
    // a checkpointed frame Catalyst has no stats for, and 2^22 bare longs
    // ≈ 32 MB — pairs ×10/decade keeps it far under the cap through
    // sf1000. r15 fusion: |tids| ≤ 2 × |truth pairs| by construction, so
    // a caller that already censused its (checkpointed) truth frame
    // passes the count and the gate needs no job of its own — and with
    // the count() gone the semi join is tids' ONLY consumer, so the
    // checkpoint goes too (the distinct subplan executes exactly once,
    // inside `small`'s materialization).
    val keys = truthPairs match {
      case Some(n) if n <= broadcastCap / 2 => broadcast(tidsPlan)
      case _ =>
        // LAZY: the census count below materializes it (tids has two
        // consumers on this path — the count and the semi join)
        val tids = tidsPlan.localCheckpoint(false)
        if (tids.count() <= broadcastCap) broadcast(tids) else tids
    }
    val small = assignment.join(keys, Seq("id"), "left_semi")
      // checkpointed: both endpoint joins below read it in one query
      // execution — without materialization the whole assignment subplan
      // would be duplicated per side. The census count right below
      // materializes it EAGERLY relative to the consuming joins, so two
      // broadcast exchanges can never race its block construction (the
      // TruthArr lesson at [[exactJaccardWindowPairs]], in miniature)
      .localCheckpoint(false)
    // Endpoint broadcasts are gated on the restricted frame's OWN census,
    // not the tids one (ADVICE r12): the semi join bounds |small| ≤ |tids|
    // only when the assignment carries at most one row per id — true of
    // every current caller (cluster labelings), but a future caller with
    // duplicated labels would have blown a tids-derived broadcast budget
    // silently. The count is one job over a pairs-sized checkpointed
    // frame; the checkpointed sides carry no stats and would otherwise
    // plan as sort-merge, shuffling the pairs-sized truth frame twice.
    flagOver(small, bc = small.count() <= broadcastCap)
  }

  /** (id, mh) signature table. The numPerm signature slots are
    * min-aggregates of cheap fixed-width re-hashes xxhash64(h, p) over
    * the exploded gram-hash rows — a codegen'd HashAggregate, NOT an
    * in-array HOF fold (64 interpreted transform() passes per doc were
    * measured ~12× slower than the aggregate). Since r11 the gram rows
    * are row-local ([[shingleHashRows]] explodes per-doc arrays — no
    * window shuffle feeds them), so partial aggregation folds each doc
    * to one signature row map-side and the only exchange left in the
    * whole signature pass is doc-sized.
    */
  def minhashSignatures(docs: DataFrame, numPerm: Int = 64): DataFrame =
    signaturesFromRows(shingleHashRows(docs), numPerm)

  /** [[minhashSignatures]] from a caller-supplied gram-array frame (the
    * [[gramHashSets]] shape) — the row-local explode of `g` produces
    * exactly [[shingleHashRows]]' rows ([[graft.functions.TextExprs
    * .gramHashes]] already returns per-doc DISTINCT hashes), so the
    * signatures are bitwise-identical while the gram kernel pass is
    * shared with the truth frame (r14 — see
    * [[exactJaccardWindowPairsArr]]).
    */
  def minhashSignaturesArr(arr: DataFrame, numPerm: Int = 64): DataFrame =
    signaturesFromRows(
      arr.select(col("id"), explode(col("g")).as("h")), numPerm)

  private def signaturesFromRows(rows: DataFrame, numPerm: Int): DataFrame =
    rows.groupBy(col("id"))
      .agg(array((0 until numPerm).map(p =>
        min(xxhash64(col("h"), lit(p)))): _*).as("mh"))

  /** LSH band keys: split the signature into bands of `rows` values and hash
    * each band; a shared (band index, band hash) pair => candidate pair.
    * The band hash feeds the `rows` longs to xxhash64 directly — no
    * string materialization per band.
    */
  def bandKeys(mh: Column, rows: Int = 4): Column =
    transform(sequence(lit(0), (size(mh) / lit(rows)).cast("int") - 1),
      b => struct(b.as("band"),
        xxhash64((1 to rows).map(i => element_at(mh, b * rows + i)): _*).as("bh")))

  /** Candidate near-dup pairs (id_a < id_b) whose estimated Jaccard (equal
    * minhash fraction) is >= threshold. `docs` must have (id, text).
    *
    * Shape: one signature pass, explode band keys, group by band key, and
    * emit in-bucket pairs from the collected member list — the signature
    * subplan runs ONCE (a band-key self-join recomputed it per side,
    * measured ~2x the total cost). Buckets larger than `maxBucket` are
    * dropped: a mega-bucket means hundreds of near-identical docs, and
    * the quadratic pair blowup inside it is exactly what kills the job
    * at 100 TB. NOTE this is a deliberate recall trade: a pair whose
    * every shared band lands in a >maxBucket bucket is LOST — run exact
    * dedup first (it collapses identical text, the main mega-bucket
    * source) or raise `maxBucket` where completeness matters more than
    * the worst-case blowup. The trade is never silent: drops bump the
    * [[DropStats]] counters (pass `stats` for handles; by default fresh
    * named accumulators still surface in the Spark UI / listeners).
    */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.5,
      numPerm: Int = 64, bandRows: Int = 4, maxBucket: Int = 256,
      stats: Option[DropStats] = None,
      gramArr: Option[DataFrame] = None): DataFrame = {
    val st = stats.getOrElse(dropStats(docs.sparkSession, "minhash"))
    val m = col("members")
    // gramArr (r14): a caller that already checkpointed the per-doc gram
    // frame (the oracle-paired queries' truth construct) shares it here,
    // so the signature pass explodes row-locally from the checkpoint
    // instead of re-running the gram kernel over the corpus — signatures
    // bitwise-identical (doc at [[minhashSignaturesArr]])
    val buckets = filterCounting(
      gramArr.map(minhashSignaturesArr(_, numPerm))
        .getOrElse(minhashSignatures(docs, numPerm))
        .select(col("id"), col("mh"), explode(bandKeys(col("mh"), bandRows)).as("bk"))
        .groupBy(col("bk"))
        .agg(collect_list(struct(col("id"), col("mh"))).as("members")),
      st, maxBucket)
    // signature agreement via the native EqualSlots kernel — the HOF
    // zip_with/aggregate fold paid ~64 interpreted lambda dispatches plus
    // an intermediate array PER CANDIDATE PAIR, which dominates once
    // duplication inflates pair counts (same count, same cast, bitwise-
    // equal est_jaccard)
    def estJaccard(a: Column, b: Column): Column =
      graft.functions.VectorExprs.equalSlots(a.getField("mh"), b.getField("mh"))
        .cast("double") / numPerm
    buckets.select(explode(flatten(
        transform(m, (a, i) =>
          transform(slice(m, i + 2, size(m)), b =>
            struct(
              least(a.getField("id"), b.getField("id")).as("id_a"),
              greatest(a.getField("id"), b.getField("id")).as("id_b"),
              estJaccard(a, b).as("est_jaccard")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.est_jaccard").as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** 64-bit SimHash of the word multiset: bit b is set when the sum of
    * per-word contributions (+1 when bit b of xxhash64(word) is 1 else -1)
    * is positive. Expressed per-bit as a plain expression over a single
    * word hash — used by [[simhashSignatures]] inside a codegen'd hash
    * aggregate (a HOF fold over a 64-counter array was measured ~10x
    * slower: higher-order lambdas run interpreted).
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

  /** (id, sh) simhash table, codegen-friendly: words explode to rows, each
    * hashed once; 64 per-bit sign sums aggregate map-side; the bit vector
    * reassembles from the sums. Same result as [[simhash]] per row.
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val h = xxhash64(col("w"))
    val sums = (0 until 64).map { b =>
      sum(when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"c$b")
    }
    docs.select(col("id"), explode(words(col("text"))).as("w"))
      .groupBy(col("id"))
      .agg(sums.head, sums.tail: _*)
      .select(col("id"),
        (0 until 64).map(b =>
          when(col(s"c$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("sh"))
  }

  /** Connected components over a near-dup pair list (id_a < id_b): each
    * node's cluster id is the minimum id reachable from it — the "keep one
    * doc per near-dup CLUSTER" step after pair generation. Iterative
    * min-label propagation: O(cluster diameter) joins, each a shuffled
    * equi-join on id; near-dup clusters are shallow (dups of dups of one
    * original), so few iterations in practice; maxIter bounds pathology.
    *
    * ADAPTIVE ROUTING (r7, same census discipline as [[Ntile.exact]]):
    * the distributed loop costs ~0.6 s/round in driver-synced job
    * overhead REGARDLESS of graph size — profiled 1.7 s on a 256-edge
    * graph, pure fixed cost across the 4 dedup-family bench queries.
    * The pair frame is materialized (checkpointed) before the loop
    * anyway, so its exact size is one cheap count: at or under
    * `driverCap` pairs (default 2^20 — a ≤16 MB collect, the same order
    * Spark itself moves for a broadcast join) and long-typed ids, the
    * components come from driver-side union-find (path-halving +
    * min-id relabel, microseconds at that size) straight over the
    * undirected pairs — the bidirectional explode, distinct and dst
    * repartition are built only on the distributed route (r14); larger
    * graphs — the 100 TB case — take the unchanged pointer-jumping
    * loop. Identical labels by construction (both compute
    * min-id-per-component; DedupSpec pins the two routes equal on the
    * same graph). `driverCap = 0` forces the distributed loop.
    *
    * `knownCount` (r15, census fusion — VERDICT r14 item 1): a caller
    * that has ALREADY materialized `pairs` (checkpointed it) and counted
    * it passes the count here, and the operator skips both its own
    * checkpoint and its route census — one fewer materialization pass
    * and one fewer driver-blocking execution per call. CONTRACT: the
    * caller must guarantee `pairs` is checkpoint-backed (otherwise the
    * pair-generation subplan re-executes per consumer below) and that
    * the count is exact for the frame passed; DedupSpec pins route
    * equality under `knownCount` against the self-censused form.
    */
  def clusters(pairs: DataFrame, maxIter: Int = 64,
      driverCap: Long = 1L << 20, knownCount: Option[Long] = None): DataFrame = {
    // The PAIR frame is what's materialized once (r14): the pair-
    // generation subplan (minhashPairs' signature/bucket pipeline, or a
    // truth construct) is the expensive input, and the route census —
    // previously a count over the exploded+distinct+dst-repartitioned
    // edge frame — needs only the pair count. Undirected pairs are ALL
    // the driver union-find needs (duplicates are idempotent, both
    // endpoints register), so the bidirectional explode, the distinct
    // (one shuffle) and the dst repartition (another) are now built —
    // and paid — ONLY on the distributed route that requires them.
    // Measured r14 at sf0.1: two exchanges + their AQE stage jobs gone
    // from every driver-routed clusters() call (8 such calls across the
    // dedup bench family). driverCap now bounds RAW PAIRS as passed —
    // the operator contract allows duplicate pairs, so the census counts
    // them too (a duplicate-heavy input can exceed the cap and take the
    // distributed loop even when its DISTINCT graph would fit: perf-only,
    // the ≤16 MB collect-size safety always holds — ADVICE r14). For
    // deduplicated inputs, pairs ≤ edges ≤ 2·pairs, so the same 2^20 cap
    // keeps the collect ≤ 16 MB of bare long pairs (the broadcast-join
    // order of driver traffic documented below).
    // LAZY checkpoint (r9 VERDICT item 1, toy-SF job floor): the route
    // census count() below materializes it in the SAME driver round-trip
    // that an eager checkpoint would have spent on its own dedicated job.
    // With a caller-supplied count the projection rides the CALLER'S
    // checkpoint instead — no second copy of the pair frame is stored and
    // no second census job runs (r15).
    val pairsCk = knownCount match {
      case Some(_) => pairs.select(col("id_a"), col("id_b"))
      case None    => pairs.select(col("id_a"), col("id_b")).localCheckpoint(false)
    }

    val longIds = Seq("id_a", "id_b").forall(c =>
      pairsCk.schema(c).dataType == org.apache.spark.sql.types.LongType)
    if (driverCap > 0 && longIds &&
        knownCount.getOrElse(pairsCk.count()) <= driverCap) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      pairsCk.collect().foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        if (!parent.contains(a)) parent(a) = a
        if (!parent.contains(b)) parent(b) = b
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(ra) = rb
      }
      val minOf = scala.collection.mutable.LongMap.empty[Long]
      parent.keys.foreach { id =>
        val r = find(id)
        minOf(r) = math.min(minOf.getOrElse(r, id), id)
      }
      return parent.keys.toSeq.map(id => (id, minOf(find(id))))
        .toDF("id", "cluster")
    }

    // ---- distributed route (the 100 TB path) -------------------------
    // Both edge directions explode from the materialized pair frame (one
    // evaluation of the pair-generation subplan either way; a union of
    // pairs with pairs-swapped would have executed it once PER UNION
    // SIDE — measured ~2s of the dedup family's bench time in r7).
    // distinct() stays: the operator's contract only asks for
    // (id_a < id_b) pairs, not uniqueness.
    // Pointer-jumping propagation: each round takes (a) the min over
    // 1-hop neighbors AND (b) the label OF the current label (path
    // compression) — chains collapse in O(log diameter) rounds, so
    // `maxIter` rounds cover chains up to ~2^maxIter deep.
    // localCheckpoint(eager) truncates the lineage per round (without it
    // round N's plan embeds all previous rounds and both Catalyst
    // analysis and re-execution blow up — measured). Round-cost design
    // (the r1 shape ran 15x SLOWER with 8x more cores — fixed per-job
    // overhead, VERDICT r1 §wrong.5):
    //  - edges are hash-partitioned by dst BEFORE the one-time
    //    checkpoint, so the per-round edge⋈label join never re-shuffles
    //    the (bigger) edge side;
    //  - the jump joins through the PREVIOUS generation's materialized
    //    labels, not the round's own hop frame — a hop-with-hop self-join
    //    re-executed the whole round subplan per side. Labels only ever
    //    decrease and old labels are still reachable-from ancestors, so
    //    jumping through the previous generation stays monotone-correct;
    //  - convergence is a per-row `changed` flag computed inside the
    //    round and tested with a narrow limit-1 scan of the round's own
    //    just-materialized checkpoint — the exceptAll comparison launched
    //    an extra full two-sided shuffle job every round.
    val edgesCk = pairsCk
      .select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .repartition(col("dst")).localCheckpoint(false)

    var labels = edgesCk.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var done = false
    // run TO CONVERGENCE — the per-row `changed` flag is the exit, and
    // maxIter is a loud pathology bound, never a silent truncation: at 8
    // rounds a >2^8-deep chain would have returned multi-label components
    // and quietly broken the "identical labels by construction" contract
    // with the driver route. 64 rounds cover 2^64-deep chains (more nodes
    // than long ids), so the require is unreachable for any real graph;
    // converged graphs still exit at their own round count, so the
    // common-case cost is unchanged.
    while (!done) {
      require(iter < maxIter,
        s"connected components did not converge in $maxIter rounds")
      val nbrMin = edgesCk
        .join(labels.select(col("id").as("dst_id"), col("cluster").as("dst_cluster")),
          col("dst") === col("dst_id"))
        .groupBy(col("src")).agg(min(col("dst_cluster")).as("nbr_cluster"))
      val hop = labels
        .join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(labels("id"), col("cluster").as("old_cluster"),
          least(col("cluster"), coalesce(col("nbr_cluster"), col("cluster")))
            .as("hop_cluster"))
      val anc = labels
        .select(col("id").as("anc_id"), col("cluster").as("anc_cluster"))
      val jumped = hop
        .join(anc, col("hop_cluster") === col("anc_id"), "left")
        .select(col("id"), col("old_cluster"),
          least(col("hop_cluster"), coalesce(col("anc_cluster"), col("hop_cluster")))
            .as("cluster"))
        .select(col("id"), col("cluster"),
          (col("cluster") =!= col("old_cluster")).as("changed"))
        .localCheckpoint(true)
      done = jumped.where(col("changed")).isEmpty
      labels = jumped.select(col("id"), col("cluster"))
      iter += 1
    }
    labels
  }

  /** The whole near-dedup pipeline as one operator: MinHash-LSH candidate
    * pairs -> connected components -> keep the minimum id per cluster
    * (docs in no cluster survive untouched). `docs` needs (id, text);
    * passthrough columns survive with the rows. This is the composition a
    * training pipeline actually runs — at 100 TB every stage is the
    * bucketed/keyed shape pinned by its own spec, and the final keep is a
    * left join against the (far smaller) label table.
    */
  def survivors(docs: DataFrame, threshold: Double = 0.5,
      gramArr: Option[DataFrame] = None): DataFrame = {
    val labels = clusters(minhashPairs(
      docs.select(col("id"), col("text")), threshold, gramArr = gramArr))
    docs.join(labels, Seq("id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("id"))
      .drop("cluster")
  }

  /** [[survivors]] with EXACT dedup run first — the documented mitigation
    * for duplicate-heavy corpora made into an operator (the minhash
    * scaladoc above has always said "run exact dedup first"; this is that
    * composition, result-pinned). Identical texts are collapsed to their
    * min-id representative BEFORE shingling, so the signature pass sees
    * each distinct text once and LSH buckets hold one member per distinct
    * near-dup text instead of one per copy — on a corpus where every doc
    * has d exact copies, in-bucket candidate pairs shrink ~d² and the
    * whole pipeline returns to unique-corpus cost.
    *
    * RESULT-IDENTICAL to [[survivors]] whenever no bucket tripped the
    * `maxBucket` cap (DedupSpec pins equality on a replicated corpus):
    * a representative is its identical-group's min id, identical texts
    * yield identical shingle sets (est. Jaccard 1 ≥ any threshold), so
    * plain survivors puts a group's members in their rep's cluster and
    * keeps only the cluster-min id — which IS the min rep id this
    * composition keeps. DEGENERATE texts (null/whitespace-only) produce
    * no shingles, so plain survivors can never pair them and they all
    * pass through — collapsing them would wrongly keep one per identical
    * group, so they bypass the collapse entirely (r4 review). Where the
    * corpora may still differ is exactly the cap: collapsed buckets stay
    * under it where the duplicated corpus overflowed and silently
    * DROPPED pairs — so exact-first recall is strictly ≥ plain, never
    * below.
    */
  def survivorsExactFirst(docs: DataFrame, threshold: Double = 0.5,
      broadcastCap: Long = 1L << 22): DataFrame = {
    // shingle-less texts can never pair in plain survivors — they ALL
    // survive there, so they must not be collapsed to a representative
    val degenerate = trim(coalesce(col("text"), lit(""))) === ""
    // Eager checkpoint for the same reason as [[clustersExactFirst]]:
    // [[survivors]] consumes reps once inside [[clusters]]' checkpointed
    // jobs and once in the final keep-join — separate query executions,
    // so without materialization the collapse aggregate runs twice.
    val reps = docs.select(col("id"), col("text"))
      .filter(!degenerate)
      .groupBy(col("text")).agg(min(col("id")).as("id"))
      .select(col("id"), col("text"))
      // LAZY: the first full-scan action inside [[survivors]] (the edge
      // census of [[clusters]]) materializes it — no dedicated job
      .localCheckpoint(false)
    // Checkpointed BEFORE the census count (r7 ADVICE): keepIds is read
    // twice — once by the gate's count() and once by the keep-join when
    // the returned plan runs — and without materialization the
    // reps-level survivors join would execute twice. It is tiny by the
    // cap's own argument (one bare long per surviving distinct text), so
    // materializing it eagerly costs what the count alone already did.
    val keepIds = survivors(reps, threshold).select(col("id"))
      // LAZY: the broadcast-gate count() below materializes it
      .localCheckpoint(false)
    // Census-gated broadcast of the keep side (same discipline as
    // [[clustersExactFirst]]'s expansion join, and for the same reason:
    // keepIds descends from CHECKPOINTED frames whose stats Catalyst
    // cannot see, so the semi-join would otherwise shuffle the whole
    // corpus by id against a few-thousand-row right side). keepIds is one
    // bare long per surviving DISTINCT text; counting the materialized
    // frame is a scan of in-memory partitions. 2^22 ids ≈ 32 MB
    // broadcast.
    val keep = if (keepIds.count() <= broadcastCap) broadcast(keepIds)
               else keepIds
    docs.filter(!degenerate).join(keep, Seq("id"), "left_semi")
      .unionByName(docs.filter(degenerate))
  }

  /** [[clusters]] over exact-collapsed pairs — the duplicate-heavy-corpus
    * shape of cluster ASSIGNMENT, mirroring [[survivorsExactFirst]] (r4
    * VERDICT item 1: CC over the un-collapsed pair graph was the last
    * minutes-vs-seconds duplication cliff — a d-copy corpus feeds CC a
    * ~d²-inflated clique graph; collapsing first returns it to
    * unique-corpus cost). Identical texts collapse to their min-id
    * representative, minhash-LSH + CC run at REP level only, and the
    * rep labels expand back over the membership map.
    *
    * RESULT-IDENTICAL to plain [[clusters]]([[minhashPairs]](docs))
    * whenever no bucket tripped `maxBucket` (DedupSpec pins equality on a
    * replicated corpus), by the same argument as [[survivorsExactFirst]]:
    *  - a rep is its identical-group's min id, so group minima ARE rep
    *    ids, and every member of a dup group connects to every other
    *    (est. Jaccard 1 ≥ threshold) — the full graph's components are
    *    the rep-level components with each rep's group glued on;
    *  - a component's min id = min over its reps' ids = the rep-level
    *    cluster label, so member m of rep r gets label cluster(r);
    *  - a rep in NO rep-level pair but with group size ≥ 2 forms its own
    *    component in the full graph (the intra-group clique) labeled by
    *    the rep itself; a singleton unpaired rep appears in no pair and
    *    gets no label — exactly plain clusters' domain;
    *  - degenerate (null/blank) texts produce no shingles, never pair,
    *    and get no label in plain clusters — so they are excluded here
    *    rather than collapsed.
    * Where the corpora CAN differ is the cap: collapsed buckets stay
    * under `maxBucket` where the duplicated corpus overflowed and
    * silently dropped pairs — exact-first labels are a superset, never
    * fewer.
    *
    * The collapse is a `groupBy(text)` AGGREGATE, not a window: partial
    * aggregation folds a d-copy group to one row map-side, so the only
    * thing shuffled by text is one row per DISTINCT text — the corpus
    * itself is never sorted (the former window shape shuffled AND sorted
    * every member row by its full text). Labels expand back over one
    * equi-join on text, which AQE broadcasts when the distinct-text side
    * is small; the corpus-side aggregate is evaluated once per consumer
    * (same trade as the tfidf df-branch — the collapse is d× cheaper than
    * the sort it replaces).
    */
  def clustersExactFirst(docs: DataFrame, threshold: Double = 0.5,
      broadcastCap: Long = 1L << 17,
      driverCap: Long = 1L << 20): DataFrame = {
    val nonDegenerate = docs.select(col("id"), col("text"))
      .filter(trim(coalesce(col("text"), lit(""))) =!= "")
    // Eager checkpoint: [[clusters]] materializes its edge graph in its
    // own jobs, so the two consumers of `groups` (pair generation there,
    // the expansion join here) run in SEPARATE query executions — exchange
    // reuse cannot span them and the corpus collapse would run twice.
    // The collapsed table is one row per DISTINCT text (the small side by
    // construction on a duplicated corpus), so materializing it is cheap.
    val groups = nonDegenerate.groupBy(col("text"))
      .agg(min(col("id")).as("rep"), count(lit(1)).as("grp_n"))
      // LAZY: materialized by [[clusters]]' edge census ([[minhashPairs]]
      // scans it inside that plan) — no dedicated job
      .localCheckpoint(false)
    // `driverCap` passes through to [[clusters]]' route choice so probes
    // (CefProbe) can A/B the CC routes on the REAL operator instead of a
    // drift-prone inlined copy of this body
    val repLabels = clusters(minhashPairs(
        groups.select(col("rep").as("id"), col("text")), threshold),
        driverCap = driverCap)
      .select(col("id").as("rep_id"), col("cluster").as("rep_cluster"))
    // Checkpointed BEFORE the census count (r7 ADVICE): `labeled` feeds
    // the gate's count() AND the expansion join — separate query
    // executions — so without materialization the groups ⋈ repLabels
    // join over the checkpointed inputs would run twice. It is bounded by
    // the distinct-text count (the cap's own argument), so the eager
    // checkpoint costs one small-join job the count was paying anyway.
    val labeled = groups.join(repLabels, col("rep") === col("rep_id"), "left")
      .filter(col("rep_cluster").isNotNull || col("grp_n") >= 2)
      .select(col("text"),
        coalesce(col("rep_cluster"), col("rep")).as("cluster"))
      // LAZY: the broadcast-gate count() below materializes it
      .localCheckpoint(false)
    // Census-gated broadcast of the expansion side. `labeled` descends
    // from checkpointed frames, so Catalyst sees no stats and plans the
    // text join as a sort-merge — shuffling AND sorting the whole corpus
    // by its full text strings against a right side that is bounded by
    // the distinct-text count (measured at sf1000: a 5 000-row right side
    // put 50 M ~1 KB texts through an exchange; the A/B probe clocked
    // that shape at 48–114 s/run with the CC route making no difference —
    // the shuffle was the entire story). Counting `labeled` is a
    // scan of its checkpointed in-memory partitions, not a corpus scan. The cap
    // is rows of (text, cluster) — 2^17 rows ≈ 100–300 MB at typical
    // document sizes, the upper end of a comfortable broadcast; above it
    // (a mostly-unique corpus where near-dup clusters rival the corpus)
    // the sort-merge join is the honest plan and stays.
    val expand = if (labeled.count() <= broadcastCap) broadcast(labeled)
                 else labeled
    nonDegenerate.join(expand, Seq("text"))
      .select(col("id"), col("cluster"))
  }

  /** Embedding-cosine near-dup pairs within a vec-id neighbor window (the
    * SQL-expressible blocking stand-in; the production blocking is the LSH
    * bucket join, [[Vectors.knnLsh]]). `emb` must have (vec_id, embedding);
    * emits (id_a, id_b, cos_sim) for id_b in (id_a, id_a + window] with
    * cosine >= threshold. The neighbor window is an exploded-candidate
    * equi-join — a raw BETWEEN theta-join plans as a nested loop.
    */
  def embeddingPairs(emb: DataFrame, window: Int = 10,
      threshold: Double = 0.3): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
      .withColumn("cand", explode(sequence(col("id_a") + 1, col("id_a") + window)))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("cand") === col("id_b"))
      .select(col("id_a"), col("id_b"),
        Vectors.cosine(col("emb_a"), col("emb_b")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Candidate pairs within Hamming distance `maxDist` of each other's
    * simhash, generated by banding the 64 bits into 4 16-bit chunks (any
    * pair at distance <= 3 shares at least one intact chunk); exact Hamming
    * distance (bit_count of XOR) filters the candidates.
    *
    * Shape mirrors [[minhashPairs]]: one signature pass, explode the 4
    * chunk keys, group by chunk key, and emit in-bucket pairs from the
    * collected member list — the previous band-key SELF-JOIN executed the
    * expensive 64-sum signature aggregate once per side (exchange reuse
    * does not fire here; measured as most of the query's cost, VERDICT r1
    * §wrong.2). Buckets larger than `maxBucket` are dropped for the same
    * reason — and with the same recall caveat — as in [[minhashPairs]]:
    * the distance<=3 completeness guarantee holds only for pairs whose
    * shared chunk bucket is under `maxBucket`; run exact dedup first or
    * raise the cap where completeness matters more.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
      maxBucket: Int = 256, stats: Option[DropStats] = None): DataFrame = {
    val st = stats.getOrElse(dropStats(docs.sparkSession, "simhash"))
    val m = col("members")
    val buckets = filterCounting(
      simhashSignatures(docs)
        .select(col("id"), col("sh"),
          explode(transform(sequence(lit(0), lit(3)),
            c => struct(c.as("ci"),
              shr(col("sh"), c * 16).bitwiseAND(0xFFFFL).as("cv")))).as("chunk"))
        .groupBy(col("chunk"))
        .agg(collect_list(struct(col("id"), col("sh"))).as("members")),
      st, maxBucket)
    buckets.select(explode(flatten(
        transform(m, (a, i) =>
          transform(slice(m, i + 2, size(m)), b =>
            struct(
              least(a.getField("id"), b.getField("id")).as("id_a"),
              greatest(a.getField("id"), b.getField("id")).as("id_b"),
              bit_count(a.getField("sh").bitwiseXOR(b.getField("sh")))
                .as("hamming")))))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.hamming").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("id_a", "id_b")
  }
}
