package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** As-of join edge semantics: simultaneous rows match (<=), rows with no
  * preceding partner get nulls, latest-of-several wins.
  */
class AsofJoinSpec extends SparkSpec {

  test("backward as-of: <= tie matches, no-predecessor is null, latest wins") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L),  // key 1, t=100
      (2L, 10L, 205L),  // key 2 rides same key space? no - key=10 for all
      (3L, 10L, 300L),
      (4L, 20L, 50L)    // key 20: no right rows at or before 50
    ).toDF("event_id", "user_id", "ts_l")
    val right = Seq(
      (10L, 100L, "a"), // equal to left t=100 -> matches (<=)
      (10L, 200L, "b"),
      (10L, 250L, "c"),
      (20L, 60L, "z")   // after left t=50 -> no match
    ).toDF("user_id", "ts_r", "tag")
    val out = AsofJoin.backward(
        left.withColumnRenamed("ts_l", "ts"), "ts",
        right.withColumnRenamed("ts_r", "ts"), "ts",
        "user_id", Seq("tag"))
      .select("event_id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("a"))   // tie at 100
    assert(out(2L).contains("b"))   // 200 <= 205, 250 not
    assert(out(3L).contains("c"))   // latest of a,b,c
    assert(out(4L).isEmpty)         // nothing precedes
  }

  test("tieBreak picks the greatest tie-break tuple among same-(key,ts) right rows") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "user_id", "ts")
    // three right rows at exactly (key=10, ts=100): rid 7 must win, on
    // every run and partitioning (ADVICE r1: (_t, _side) alone is not a
    // total order)
    val right = Seq(
      (10L, 100L, 5L, "five"),
      (10L, 100L, 7L, "seven"),
      (10L, 100L, 6L, "six")
    ).toDF("user_id", "ts", "rid", "tag")
    (1 to 3).foreach { _ =>
      val out = AsofJoin.backward(
          left, "ts", right.repartition(3), "ts",
          "user_id", Seq("rid", "tag"), tieBreak = Seq("rid"))
        .select("rid", "tag").collect()
      assert(out.length == 1)
      assert(out.head.getLong(0) == 7L && out.head.getString(1) == "seven")
    }
  }

  test("winning row's null payload field stays null (no cross-row column mixing)") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("event_id", "user_id", "ts")
    // rid=7 wins the tie but carries tag=null; the output must be
    // (7, null) — not (7, "five") stitched from the losing row
    val right = Seq(
      (10L, 100L, 5L, Option("five")),
      (10L, 100L, 7L, Option.empty[String])
    ).toDF("user_id", "ts", "rid", "tag")
    val out = AsofJoin.backward(left, "ts", right, "ts",
        "user_id", Seq("rid", "tag"), tieBreak = Seq("rid"))
      .select("rid", "tag").collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 7L && out.head.isNullAt(1),
      s"mixed payload row: ${out.head}")
  }

  test("null keys never match (SQL join semantics)") {
    import spark.implicits._
    val left = Seq((1L, Option.empty[Long], 100L), (2L, Option(5L), 100L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((Option.empty[Long], 50L, "nullside"), (Option(5L), 50L, "ok"))
      .toDF("user_id", "ts", "tag")
    val out = AsofJoin.backward(left, "ts", right, "ts", "user_id", Seq("tag"))
      .select("event_id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).isEmpty)       // null-keyed left row matches nothing
    assert(out(2L).contains("ok"))
  }
}
