package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Ntile

/** [[graft.operators.Ntile.exact]] — the distributed exact-NTILE operator
  * that replaced the r4–r6 group-size guard — must reproduce the built-in
  * window `ntile(k)` ROW-FOR-ROW, including every shape that makes exact
  * distributed NTILE hard:
  *
  *  - heavy VALUE ties (rows tied at a tile boundary split between tiles
  *    by id — the boundary's tie-break id must be the exact in-run rank);
  *  - mega tie runs past the collect cap (the id-domain bisection path);
  *  - groups smaller than k (some tiles empty, repeated boundary ranks);
  *  - multiple k values (boundary rank arithmetic n = k·q + r).
  */
class NtileSpec extends SparkSpec {

  private def windowTiles(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy("v", "id")
    df.withColumn("tile", ntile(k).over(w))
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame, k: Int,
      tieCap: Long = 1000000L): Unit = {
    // windowCap = 0 forces the boundary machinery everywhere (the spec's
    // fixtures are all far under the default routing cap, so the default
    // would silently route every group to the window path and this spec
    // would stop covering the machinery); the default-cap call then pins
    // the adaptive entry point end-to-end on the same data
    Seq(0L, 1000000L).foreach { cap =>
      val got = Ntile.exact(df, col("g"), col("v"), col("id"), k,
          tieCap = tieCap, windowCap = cap)
        .select(col("g"), col("v"), col("id"), col("tile"))
      val want = windowTiles(df, k).select(col("g"), col("v"), col("id"), col("tile"))
      val extra = got.exceptAll(want)
      val missing = want.exceptAll(got)
      if (!(extra.isEmpty && missing.isEmpty))
        fail(s"k=$k windowCap=$cap mismatch; extra=${extra.take(5).toSeq} " +
          s"missing=${missing.take(5).toSeq}")
    }
  }

  test("matches window ntile on heavily tied values, several k") {
    import spark.implicits._
    // 3 groups x 2000 rows, values drawn from only 17 distinct doubles so
    // every tile boundary lands inside a tie run; ids unique per group
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 1 to 2000
    } yield (g, ((i * 7919) % 17).toDouble, i.toLong)
    val df = rows.toDF("g", "v", "id")
    Seq(2, 7, 10).foreach(k => assertSame(df, k))
  }

  test("mega tie run takes the bisection path and still matches exactly") {
    import spark.implicits._
    // one constant-valued group: EVERY boundary's tie run is the whole
    // group, far past tieCap=64 — selection must bisect the id domain
    // (never collect 5000 ids into one buffer) and land on the same
    // tie-break ids the window sort implies. Non-contiguous ids make the
    // id-interval midpoints irregular.
    val df = (1 to 5000).map(i => ("mega", 1.0, i.toLong * 13 + (i % 7)))
      .toDF("g", "v", "id")
    assertSame(df, 10, tieCap = 64)
  }

  test("bisection interval straddling the long domain cannot overflow the midpoint") {
    import spark.implicits._
    // one constant-valued group whose ids reach from near Long.MinValue to
    // near Long.MaxValue: hi - lo wraps negative in raw long subtraction,
    // so the naive lo + (hi - lo)/2 midpoint refines NOTHING and burns
    // maxRounds before throwing (the r7 review's failure case). The
    // overflow-safe (lo & hi) + ((lo ^ hi) >> 1) form must converge to the
    // window form's exact tie-break ids. Ids are irregular on both sides
    // of zero so midpoints land in both halves across rounds.
    val ids = (1 to 600).map(i => Long.MinValue + 7 + i.toLong * 9973) ++
      (1 to 600).map(i => Long.MaxValue - 11 - i.toLong * 7919) ++
      (1 to 300).map(i => i.toLong * 31 - 4650)
    val df = ids.distinct.map(id => ("straddle", 1.0, id)).toDF("g", "v", "id")
    assertSame(df, 7, tieCap = 16)
  }

  test("mixed tie runs and spread values, bisection forced") {
    import spark.implicits._
    // half the rows pile onto two hot values, half spread — boundaries can
    // fall in a run or between runs; tiny cap forces bisection on the runs
    val rows = (1 to 4000).map { i =>
      val v = if (i % 2 == 0) (i % 4) / 2.0 else i.toDouble
      ("m", v, i.toLong)
    }
    assertSame(rows.toDF("g", "v", "id"), 10, tieCap = 32)
  }

  test("groups smaller than k get one row per leading tile") {
    import spark.implicits._
    val df = (Seq(("one", 5.0, 1L)) ++
      (1 to 5).map(i => ("five", i.toDouble, i.toLong)) ++
      (1 to 9).map(i => ("nine", 9.0, i.toLong)) // n<k AND all tied
    ).toDF("g", "v", "id")
    assertSame(df, 10)
    // explicit: the 5-row group fills tiles 1..5 with one row each
    val tiles = Ntile.exact(df, col("g"), col("v"), col("id"), 10)
      .filter(col("g") === "five").select("tile")
      .collect().map(_.getInt(0)).sorted
    assert(tiles.sameElements(Array(1, 2, 3, 4, 5)))
  }

  test("adaptive routing splits groups at windowCap and both halves match") {
    import spark.implicits._
    // windowCap=100: the 60-row groups route to the window path, the
    // 300-row groups to the boundary machinery, in ONE call — the union
    // must be row-for-row the pure window form. Tied values in both
    // halves keep the tie-break arithmetic honest across the split.
    val rows =
      (for (g <- Seq("s1", "s2"); i <- 1 to 60)
        yield (g, ((i * 31) % 5).toDouble, i.toLong)) ++
      (for (g <- Seq("L1", "L2"); i <- 1 to 300)
        yield (g, ((i * 31) % 5).toDouble, i.toLong))
    val df = rows.toDF("g", "v", "id")
    val got = Ntile.exact(df, col("g"), col("v"), col("id"), 7,
        windowCap = 100)
      .select(col("g"), col("v"), col("id"), col("tile"))
    val want = windowTiles(df, 7).select(col("g"), col("v"), col("id"), col("tile"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("routing boundary: a group exactly AT windowCap stays on the window path; nulls don't count toward the census") {
    import spark.implicits._
    // "at": 61 non-null rows with windowCap=61 → window route; "over": 62
    // rows → machinery route; "nul": 30 real rows + 200 null-value rows —
    // the census counts only non-null rows, so it routes to the window
    // path, where the nulls must surface as NULL tiles without ever
    // entering the window sort
    val rows =
      (1 to 61).map(i => ("at", Some((i % 3).toDouble), i.toLong)) ++
      (1 to 62).map(i => ("over", Some((i % 3).toDouble), i.toLong)) ++
      (1 to 30).map(i => ("nul", Some(i.toDouble), i.toLong)) ++
      (31 to 230).map(i => ("nul", Option.empty[Double], i.toLong))
    val df = rows.toDF("g", "v", "id")
    val got = Ntile.exact(df, col("g"), col("v"), col("id"), 5,
      windowCap = 61)
    assert(got.filter(col("g") === "nul" && col("v").isNull)
      .select("tile").collect().forall(_.isNullAt(0)))
    val nonNull = got.filter(col("v").isNotNull)
      .select(col("g"), col("v"), col("id"), col("tile"))
    val want = windowTiles(df.filter(col("v").isNotNull), 5)
      .select(col("g"), col("v"), col("id"), col("tile"))
    assert(nonNull.exceptAll(want).isEmpty && want.exceptAll(nonNull).isEmpty)
  }

  test("a group whose sort values are ALL null keeps its rows at a NULL tile on both routes") {
    import spark.implicits._
    // such a group has NO boundary row, so an inner final join would
    // silently drop it from the machinery route while the window route
    // kept it — output row count must never depend on the route taken
    val df = ((1 to 10).map(i => ("allnull", Option.empty[Double], i.toLong)) ++
      (1 to 20).map(i => ("real", Some(i.toDouble), i.toLong))).toDF("g", "v", "id")
    Seq(0L, 1000000L).foreach { cap =>
      val got = Ntile.exact(df, col("g"), col("v"), col("id"), 4, windowCap = cap)
      assert(got.count() === 30, s"windowCap=$cap dropped rows")
      val an = got.filter(col("g") === "allnull").select("tile").collect()
      assert(an.length === 10 && an.forall(_.isNullAt(0)), s"windowCap=$cap")
    }
  }

  test("NULL group key is a real group on every route, matching the window form") {
    import spark.implicits._
    // the window form groups null partition keys together; the operator
    // must too — on the window route, on the forced machinery route
    // (struct-wrapped key through every equi-join), and on the mixed route
    // where the null-key group is the OVERSIZED one (null-safe routing
    // joins; plain === would strand all its rows on the window path)
    val rows =
      (1 to 300).map(i => (Option.empty[String], ((i * 31) % 5).toDouble, i.toLong)) ++
      (1 to 60).map(i => (Some("s"), ((i * 31) % 5).toDouble, i.toLong))
    val df = rows.toDF("g", "v", "id")
    Seq(0L, 100L, 1000000L).foreach { cap =>
      val got = Ntile.exact(df, col("g"), col("v"), col("id"), 7, windowCap = cap)
        .select(col("g"), col("v"), col("id"), col("tile"))
      val want = windowTiles(df, 7).select(col("g"), col("v"), col("id"), col("tile"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"windowCap=$cap")
    }
    // homogeneous oversized null-key input: the census routes the WHOLE
    // df to the machinery, so this pins the struct-keyed joins end-to-end
    val onlyNull = rows.take(300).toDF("g", "v", "id")
    val got = Ntile.exact(onlyNull, col("g"), col("v"), col("id"), 7,
        windowCap = 100)
      .select(col("g"), col("v"), col("id"), col("tile"))
    val want = windowTiles(onlyNull, 7)
      .select(col("g"), col("v"), col("id"), col("tile"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("null sort values surface as NULL tiles, never misbin non-null rows") {
    import spark.implicits._
    val df = (Seq(("a", Option.empty[Double], 0L)) ++
      (1 to 20).map(i => ("a", Some(i.toDouble), i.toLong))).toDF("g", "v", "id")
    // both routing paths must implement the same null posture
    Seq(0L, 1000000L).foreach { cap =>
      val got = Ntile.exact(df, col("g"), col("v"), col("id"), 4,
        windowCap = cap)
      assert(got.filter(col("id") === 0).select("tile").first().isNullAt(0))
      val nonNull = got.filter(col("v").isNotNull)
        .select(col("g"), col("v"), col("id"), col("tile"))
      val want = windowTiles(df.filter(col("v").isNotNull), 4)
      assert(nonNull.exceptAll(want).isEmpty && want.exceptAll(nonNull).isEmpty)
    }
  }
}
