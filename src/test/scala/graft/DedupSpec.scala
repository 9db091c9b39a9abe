package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** MinHash-LSH / SimHash semantics pinned on planted near-duplicates (these
  * operators are rows-only in the driver's oracle check, so this spec is
  * their correctness gate).
  */
class DedupSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the deep green forest tonight"
    Seq(
      (1L, base),
      (2L, base),                                           // exact dup of 1
      (3L, base.replace("lazy", "sleepy")),                 // near dup of 1
      (4L, "completely different words about spark query engines and shuffle partitions at massive scale"),
      (5L, "yet another unrelated document mentioning parquet files column pruning and predicate pushdown"),
      (6L, base.split(' ').reverse.mkString(" "))            // word-shuffled 1
    ).toDF("id", "text")
  }

  test("minhash: exact + near dups found, unrelated docs not paired") {
    val pairs = Dedup.minhashPairs(corpus, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("pair recall flag: true on the real candidate set, false on an empty one") {
    // the r10 oracle-pairing machinery for q_dedup_minhash/q_dedup_simhash:
    // truth = exact window pairs; flag = genuine recall of the candidates
    val truth = Dedup.exactJaccardWindowPairs(corpus.select(
      col("id"), col("text")), tau = 0.5, window = 200)
    assert(truth.count() >= 2, "fixture must plant window truth pairs")
    // positive arm: the real minhash candidates catch the planted dups
    val flagged = Dedup.withPairRecallFlag(truth,
      Dedup.minhashPairs(corpus, threshold = 0.5), 0.7, "ok")
    val rows = flagged.collect()
    assert(rows.length == truth.count())
    assert(rows.forall(_.getAs[Boolean]("ok")), "real candidates must pass 0.7")
    // negative arm: an empty candidate set must flip the flag on every row
    val none = Dedup.minhashPairs(corpus, threshold = 0.5).filter(lit(false))
    val failed = Dedup.withPairRecallFlag(truth, none, 0.25, "ok").collect()
    assert(failed.nonEmpty && failed.forall(!_.getAs[Boolean]("ok")),
      "zero recall must fail even the loosest declared bound")
    // truth rows carry the exact jaccard, not the estimate: planted exact
    // dup (1,2) is jaccard 1.0
    val j12 = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(j12.exists(_.getAs[Double]("jaccard") == 1.0))
  }

  test("minhash: exact dup pair has estimated jaccard 1.0") {
    val est = Dedup.minhashPairs(corpus, threshold = 0.5)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .select("est_jaccard").first().getDouble(0)
    assert(est == 1.0)
  }

  test("minhash signatures are stable across partitionings") {
    val one = Dedup.minhashSignatures(corpus.repartition(1)).orderBy("id").collect()
    val four = Dedup.minhashSignatures(corpus.repartition(4)).orderBy("id").collect()
    assert(one.sameElements(four))
  }

  test("simhash: identical text and word-shuffled text => distance 0; unrelated not paired") {
    // simhash is a word-multiset fingerprint: reordering must not move it.
    // (Single-word edits on short docs flip O(sqrt(n)) bits — near-dup
    // recall for edits is minhash's job, pinned above.)
    val pairs = Dedup.simhashPairs(corpus, maxDist = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((1L, 2L)).contains(0))
    assert(pairs.get((1L, 6L)).contains(0))
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("clusters: chains collapse to min-id components (both routes)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 7L))
      .toDF("id_a", "id_b")
    // driverCap=0 forces the distributed pointer-jumping loop; the default
    // routes this small graph to driver-side union-find — both must give
    // the same min-id labels
    Seq(0L, 1L << 20).foreach { cap =>
      val got = Dedup.clusters(pairs, driverCap = cap).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
        10L -> 10L, 11L -> 10L), s"driverCap=$cap")
    }
  }

  test("clusters: a chain deeper than the old 8-round bound still converges (distributed route)") {
    import spark.implicits._
    // a 700-node path graph has diameter 699 > 2^8: under the former
    // fixed maxIter=8 exit the distributed loop returned UNCONVERGED
    // multi-label components silently, diverging from the driver route the
    // scaladoc declares identical (r7 review). The loop now runs to its
    // `changed`-flag fixpoint (~log2(diameter) rounds), so both routes
    // must agree on the single min-id component.
    val chain = (1 to 699).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    Seq(0L, 1L << 20).foreach { cap =>
      val got = Dedup.clusters(chain, driverCap = cap).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == 700 && got.values.forall(_ == 1L), s"driverCap=$cap")
    }
  }

  test("clusters over minhash pairs group the planted dups under the min id") {
    val got = Dedup.clusters(Dedup.minhashPairs(corpus, threshold = 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1, 2 (exact), 3 (near), 6 (shuffled multiset: distinct shingles
    // differ, may or may not pair) — at minimum 1,2,3 share cluster 1
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(!got.contains(4L) && !got.contains(5L))
  }

  test("clusters equal a union-find reference on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L) // fixed seed: deterministic
    for (trial <- 1 to 3) {
      // random graphs with long chains and dense pockets — the shapes
      // that stress pointer-jumping convergence within maxIter
      val n = 120
      val edges = (1 to 150).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      // driver-side union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(id => id -> {
          // canonical label: min node id in the component
          val root = find(id.toInt)
          edges.flatMap(e => Seq(e._1, e._2)).distinct
            .filter(o => find(o.toInt) == root).min
        }).toMap
      // the DISTRIBUTED route against the reference (driverCap=0 — the
      // default would route these small graphs to driver union-find and
      // this test would stop covering pointer-jumping), then the driver
      // route against the same reference: the two routes are pinned equal
      // through it
      Seq(0L, 1L << 20).foreach { cap =>
        val got = Dedup.clusters(edges.toDF("id_a", "id_b"), driverCap = cap)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"trial $trial driverCap=$cap")
      }
    }
  }

  test("survivors pipeline: near-dup group keeps only its min id, unpaired docs pass through") {
    val sv = Dedup.survivors(corpus).select("id").collect()
      .map(_.getLong(0)).toSet
    // 1,2,3 cluster under 1 (pinned above): only 1 survives of them;
    // 4 and 5 are unpaired and must pass through; 6 (word-shuffled) may
    // or may not have paired, so it's unconstrained here
    assert(sv.contains(1L) && sv.contains(4L) && sv.contains(5L))
    assert(!sv.contains(2L) && !sv.contains(3L))
  }

  test("exact-first survivors equal plain survivors on a replicated corpus") {
    // 3 bitwise copies of every doc under shifted ids — the
    // duplicate-heavy shape where plain survivors pays quadratic
    // in-bucket pairs; result must be IDENTICAL (no bucket trips the
    // maxBucket cap on this corpus, the only divergence the scaladoc
    // permits — and there exact-first recall would be strictly higher)
    import spark.implicits._
    // include DEGENERATE texts (empty / whitespace-only / null): they
    // yield no shingles, so plain survivors can never pair them and ALL
    // copies must pass through — the collapse has to bypass them
    // (r4 review finding)
    val withDegenerate = corpus.unionByName(Seq(
      (50L, ""), (51L, ""), (52L, "   "), (53L, "   "),
      (54L, null.asInstanceOf[String])).toDF("id", "text"))
    val dup = (0 until 3).map(i =>
        withDegenerate.select((col("id") + lit(i * 1000L)).as("id"), col("text")))
      .reduce(_ unionByName _)
    val plain = Dedup.survivors(dup).select("id").collect()
      .map(_.getLong(0)).sorted
    val fast = Dedup.survivorsExactFirst(dup).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(plain.sameElements(fast),
      s"plain=${plain.mkString(",")} fast=${fast.mkString(",")}")
    // and the composition still behaves like survivors on the base corpus
    val base = Dedup.survivorsExactFirst(corpus).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(base.contains(1L) && base.contains(4L) && base.contains(5L))
    assert(!base.contains(2L) && !base.contains(3L))
  }

  test("exact-first clusters equal plain clusters on a replicated corpus") {
    // Same replicated shape as the survivors pin: 3 bitwise copies of
    // every doc (plus degenerate texts) under shifted ids. Cluster label
    // MAPS must be identical — not just up to representative renaming,
    // because both variants label a component by its min id and the
    // exact-first reps ARE the group minima.
    import spark.implicits._
    val withDegenerate = corpus.unionByName(Seq(
      (50L, ""), (51L, ""), (52L, "   "), (53L, "   "),
      (54L, null.asInstanceOf[String])).toDF("id", "text"))
    val dup = (0 until 3).map(i =>
        withDegenerate.select((col("id") + lit(i * 1000L)).as("id"), col("text")))
      .reduce(_ unionByName _)
    val plain = Dedup.clusters(Dedup.minhashPairs(dup, threshold = 0.5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = Dedup.clustersExactFirst(dup, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plain == fast,
      s"only-plain=${(plain.toSet -- fast.toSet).toSeq.sorted.take(10)} " +
        s"only-fast=${(fast.toSet -- plain.toSet).toSeq.sorted.take(10)}")
    // sanity on the base corpus: 1,2,3 share cluster 1; 4,5 unlabeled
    val base = Dedup.clustersExactFirst(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base(1L) == 1L && base(2L) == 1L && base(3L) == 1L)
    assert(!base.contains(4L) && !base.contains(5L))
  }

  test("restricted cluster-agreement flag equals the unrestricted form") {
    // r12 (VERDICT r11 item 1): the flag's endpoint joins semi-filter the
    // corpus-sized assignment to truth-pair ids first. A left join only
    // reads assignment rows at truth ids, so the value must be identical —
    // pinned on a replicated corpus (every doc labeled, the adversarial
    // decade shape) for an agreeing assignment, a disagreeing one, and an
    // empty truth frame.
    import spark.implicits._
    val dup = (0 until 3).map(i =>
        corpus.select((col("id") + lit(i * 1000L)).as("id"), col("text")))
      .reduce(_ unionByName _)
    val truth = Dedup.exactJaccardWindowPairs(
      dup.select(col("id"), col("text")), tau = 0.5, window = 200)
      .localCheckpoint(false)
    assert(truth.count() >= 2, "fixture must plant truth pairs")
    def unrestricted(assign: org.apache.spark.sql.DataFrame,
        name: String): Boolean = truth
      .join(assign.select(col("id").as("id_a"), col("cluster").as("__ca")),
        Seq("id_a"), "left")
      .join(assign.select(col("id").as("id_b"), col("cluster").as("__cb")),
        Seq("id_b"), "left")
      .agg((count(when(col("__ca") === col("__cb"), 1)) >=
        count(lit(1)).cast("double") * lit(0.7)).as(name))
      .collect().head.getBoolean(0)
    val good = Dedup.clustersExactFirst(dup, threshold = 0.5)
      .localCheckpoint(false)
    // a deliberately wrong assignment: every id its own cluster
    val bad = dup.select(col("id"), col("id").as("cluster"))
      .localCheckpoint(false)
    for ((assign, label) <- Seq((good, "agreeing"), (bad, "disagreeing"))) {
      val restricted = Dedup.clusterAgreementFlag(truth, assign, 0.7, "ok")
        .collect().head.getBoolean(0)
      assert(restricted == unrestricted(assign, "ok"),
        s"$label assignment: restricted flag diverged")
    }
    assert(!Dedup.clusterAgreementFlag(truth, bad, 0.7, "ok")
      .collect().head.getBoolean(0), "disagreeing assignment must fail")
    // the sub-broadcast-cap census arm too (cap 0 forces the plain join)
    assert(Dedup.clusterAgreementFlag(truth, good, 0.7, "ok",
      broadcastCap = 0L).collect().head.getBoolean(0))
    // empty truth: vacuously true in both forms (0 >= 0)
    val emptyTruth = truth.filter(lit(false)).localCheckpoint(false)
    assert(Dedup.clusterAgreementFlag(emptyTruth, good, 0.7, "ok")
      .collect().head.getBoolean(0))
  }

  test("clusters: caller-censused route (knownCount) equals the self-censused form") {
    // r15 census fusion (VERDICT r14 item 1): a caller that already
    // checkpointed and counted its pair frame passes the count; the
    // operator skips its own checkpoint + census. Labels must be
    // identical on BOTH routes — knownCount only chooses routing, and
    // the contract requires a checkpoint-backed frame with an exact
    // count, which this fixture honors.
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 7L))
      .toDF("id_a", "id_b").localCheckpoint(false)
    val n = pairs.count()
    val expected = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver route (n ≤ default cap) and distributed route (cap below n)
    for (cap <- Seq(1L << 20, n - 1)) {
      val got = Dedup.clusters(pairs, driverCap = cap,
        knownCount = Some(n)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"driverCap=$cap")
    }
  }

  test("agreement flag: fused truth census and LocalRelation gate equal the census-gated form") {
    // r15 (VERDICT r14 item 1): (a) truthPairs=Some(n) skips the tids
    // census — |tids| ≤ 2·|truth| bounds the broadcast instead; (b) a
    // LocalRelation-backed assignment (the driver-route clusters output)
    // under the cap skips the semi-join restriction and BOTH censuses.
    // Each gated path must equal the self-censused flag on agreeing and
    // disagreeing assignments.
    import spark.implicits._
    val dup = (0 until 3).map(i =>
        corpus.select((col("id") + lit(i * 1000L)).as("id"), col("text")))
      .reduce(_ unionByName _)
    val truth = Dedup.exactJaccardWindowPairs(
      dup.select(col("id"), col("text")), tau = 0.5, window = 200)
      .localCheckpoint(false)
    val truthN = truth.count()
    assert(truthN >= 2, "fixture must plant truth pairs")
    // LocalRelation assignment straight from the driver-route clusters
    val goodLocal = Dedup.clusters(Dedup.minhashPairs(dup, threshold = 0.5))
    assert({
      import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
      goodLocal.queryExecution.analyzed match {
        case _: LocalRelation | Project(_, _: LocalRelation) => true
        case _                                               => false
      }
    }, "fixture must exercise the LocalRelation gate")
    // the same labels with the gate defeated (checkpoint -> LogicalRDD)
    val goodCk = goodLocal.localCheckpoint(false)
    val badLocal = dup.select(col("id"), col("id").as("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("id", "cluster")
    val badCk = badLocal.localCheckpoint(false)
    for (((gated, ungated), label) <- Seq(
        (goodLocal, goodCk) -> "agreeing", (badLocal, badCk) -> "disagreeing")) {
      val self = Dedup.clusterAgreementFlag(truth, ungated, 0.7, "ok")
        .collect().head.getBoolean(0)
      val localGate = Dedup.clusterAgreementFlag(truth, gated, 0.7, "ok")
        .collect().head.getBoolean(0)
      val fused = Dedup.clusterAgreementFlag(truth, ungated, 0.7, "ok",
        truthPairs = Some(truthN)).collect().head.getBoolean(0)
      assert(localGate == self, s"$label: LocalRelation gate diverged")
      assert(fused == self, s"$label: fused truth census diverged")
    }
    // oversized truthPairs must fall back to the censused arm, same value
    assert(Dedup.clusterAgreementFlag(truth, goodCk, 0.7, "ok",
      truthPairs = Some(Long.MaxValue / 4)).collect().head.getBoolean(0) ==
      Dedup.clusterAgreementFlag(truth, goodCk, 0.7, "ok")
        .collect().head.getBoolean(0))
  }

  test("minhashSignaturesArr over gramHashSets is bitwise-identical to minhashSignatures") {
    // ADVICE r14: the gramArr sharing plumbing guards a strong
    // correctness claim (same filter, same expression, row-local
    // explode) — pin it so re-enablement after an sf10 probe is safe.
    val viaArr = Dedup.minhashSignaturesArr(Dedup.gramHashSets(corpus))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val direct = Dedup.minhashSignatures(corpus)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaArr == direct)
  }

  test("embedding pairs: planted near-identical vectors found above a sharp threshold, orthogonal not paired") {
    import spark.implicits._
    // 21 is 20 + tiny noise (cosine ~0.9999); 22 is orthogonal to 20;
    // 23 is anti-parallel (cosine -1). With threshold 0.95 only the
    // planted near-dup pair must survive — far sharper than the synthetic
    // corpus's 0.3 gate (VERDICT r1 next-round item 9).
    val emb = Seq(
      (20L, Array(1.0f, 0.0f, 2.0f, 0.5f)),
      (21L, Array(1.001f, 0.002f, 1.999f, 0.5f)),
      (22L, Array(0.0f, 1.0f, 0.0f, -4.0f)),
      (23L, Array(-1.0f, 0.0f, -2.0f, -0.5f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(emb, window = 10, threshold = 0.95)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((20L, 21L)))
  }

  test("maxBucket drops are observable: dropped-bucket metrics reported") {
    import spark.implicits._
    // A trio of identical docs (all its buckets have 3 members -> dropped
    // at maxBucket=2, losing the trio's pairs) next to an identical pair
    // (bucket size 2 -> kept). The recall trade must be visible at
    // runtime, not silent: the DropStats accumulators report
    // (dropped_buckets, dropped_members, largest_bucket).
    val trioAndPair = Seq(
      (11L, "alpha beta gamma delta epsilon zeta"),
      (12L, "alpha beta gamma delta epsilon zeta"),
      (13L, "alpha beta gamma delta epsilon zeta"),
      (21L, "omicron sigma tau upsilon phi chi"),
      (22L, "omicron sigma tau upsilon phi chi")).toDF("id", "text")
    val simSt = Dedup.dropStats(spark, "simhash-test")
    val minSt = Dedup.dropStats(spark, "minhash-test")
    for ((name, st, df) <- Seq(
        ("simhash", simSt,
          Dedup.simhashPairs(trioAndPair, maxBucket = 2, stats = Some(simSt))),
        ("minhash", minSt,
          Dedup.minhashPairs(trioAndPair, maxBucket = 2, stats = Some(minSt))))) {
      val pairs = df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((21L, 22L)),
        s"$name: trio pairs dropped, pair kept — got $pairs")
      // EXACT counts (no task retries in local tests): the trio collides
      // in every band/chunk — simhash has 4 chunks, minhash 16 bands —
      // and each dropped bucket holds exactly the 3 trio members. An
      // accidentally-duplicated counting expression (e.g. expanded into
      // both conjuncts of a between()) doubles these and fails here.
      val expectBuckets = if (name == "simhash") 4L else 16L
      assert(st.droppedBuckets.value == expectBuckets, name)
      assert(st.droppedMembers.value == expectBuckets * 3, name)
      assert(st.largestBucket.value == 3L, name)
    }
  }

  test("EqualSlots counts null slots as not-equal in both eval modes") {
    // ADVICE r4: the unguarded getLong read a null slot as raw 0, so two
    // null slots counted as equal — diverging from the zip_with fold it
    // replaced (x === y is NULL there, counted as not-equal). Unreachable
    // from minhash signatures (min-aggregates of non-null hashes), but
    // the kernel is public: pin the fold semantics on null-bearing input.
    val df = spark.sql(
      "SELECT array(1L, 2L, NULL, 7L) AS a, array(1L, NULL, NULL, 8L) AS b")
    // codegen path (plain projection)
    val cg = df.select(graft.functions.VectorExprs
        .equalSlots(col("a"), col("b")).as("c"))
      .first().getInt(0)
    assert(cg == 1, s"codegen: $cg")
    // interpreted path — inside a HOF lambda, exactly how minhashPairs
    // evaluates it during pair emission
    val interp = df.select(element_at(
        transform(array(struct(col("a"), col("b"))), s =>
          graft.functions.VectorExprs.equalSlots(
            s.getField("a"), s.getField("b"))), 1).as("c"))
      .first().getInt(0)
    assert(interp == 1, s"interpreted: $interp")
  }

  test("shingles: short docs degrade to whole-text shingle") {
    import spark.implicits._
    val rows = Seq((1L, "one two"), (2L, "one")).toDF("id", "text")
      .select(col("id"), Dedup.shingles(Dedup.words(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) == Seq("one two"))
    assert(rows(2L) == Seq("one"))
  }

  test("oracle-harness SFs plant non-empty truth; measured recall near recorded") {
    // ADVICE r10 (two items). (a) withPairRecallFlag is vacuously TRUE on
    // an EMPTY truth frame — zero declared rows would pass the driver's
    // hash gate while a dead candidate path went unchecked. Guard every SF
    // the oracle harness actually runs (sf0.01 Verify, sf0.1 Bench,
    // sf0.001 specs): each must plant window truth pairs, keeping the
    // flag's trip-wire armed.
    def truthAt(sf: String) = Dedup.exactJaccardWindowPairs(
      spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
        .select(col("doc_id").as("id"), col("text")),
      tau = 0.5, window = 200)
    Seq("0.01", "0.1").foreach { sf =>
      assert(truthAt(sf).limit(2).count() == 2,
        s"sf$sf truth frame must plant >=2 window pairs")
    }
    // (b) the declared simhash bound (0.25) is deliberately loose for
    // unknown corpora, so a regression that halves recall keeps the query
    // flag green. Pin MEASURED recall on this corpus near its recorded
    // value instead (DedupRecallProbe r10: minhash 1.0, simhash 0.722 at
    // sf0.001) — a broken band/chunk moves these; the loose bound stays
    // for corpora with genuine boundary pairs.
    val truth = truthAt("0.001").select("id_a", "id_b").localCheckpoint()
    val nTruth = truth.count()
    assert(nTruth >= 2, "sf0.001 truth frame must plant >=2 window pairs")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    def recall(cand: org.apache.spark.sql.DataFrame): Double =
      truth.join(cand.select("id_a", "id_b").filter(
          col("id_b") - col("id_a") <= 200),
        Seq("id_a", "id_b"), "left_semi").count().toDouble / nTruth
    val mh = recall(Dedup.minhashPairs(docs, threshold = 0.5))
    val sh = recall(Dedup.simhashPairs(docs, maxDist = 3))
    assert(mh >= 0.9, s"minhash recall $mh regressed from recorded 1.0")
    assert(sh >= 0.6, s"simhash recall $sh regressed from recorded 0.722")
  }
}
