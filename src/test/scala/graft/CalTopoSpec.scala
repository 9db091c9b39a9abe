package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.CalTopo
import graft.sources.CalTopoFeatures

/** Reference-pipeline edge cases from the reference's own bug history
  * (FIXTURES.md §3): geometry-less features (CHANGELOG v2.2.0), 4-component
  * coordinates (v2.3.1), falsy marker-color/description (task.ts:114,132),
  * dangling folderId (task.ts:144-149).
  */
class CalTopoSpec extends SparkSpec {

  private def handRows: DataFrame = {
    import spark.implicits._
    // (id, class, title, description, marker_color, folder_id,
    //  geom_type or null, coordinates json)
    Seq(
      ("m1", "Marker", "With color", "d", "FF0000", "F1", "Point", "[10.5,20.25,100.0,999.0]"),
      ("m2", "Marker", "Empty color", "", "", null, "Point", "[1.0,2.0]"),
      ("m3", "Marker", "No geometry", null, null, "F1", null, null),
      ("s1", "Shape", "Line", "x", null, "DANGLING", "LineString",
        "[[0.0,0.0,5.0,7.0],[1.0,1.0,6.0,8.0]]"),
      ("F1", "Folder", "My Folder", null, null, null, null, null)
    ).toDF("id", "class", "title", "description", "marker_color",
        "folder_id", "geom_type", "coords")
      .select(col("id"), col("class"), col("title"), col("description"),
        lit("me").as("creator"), lit(1L).as("updated"),
        lit(null).cast("string").as("marker_symbol"),
        lit(null).cast("string").as("marker_rotation"),
        col("marker_color"),
        lit(null).cast("string").as("marker_size"),
        lit(null).cast("string").as("stroke"),
        lit(null).cast("double").as("stroke_opacity"),
        lit(null).cast("double").as("stroke_width"),
        lit(null).cast("string").as("pattern"),
        lit(null).cast("string").as("fill"),
        lit(null).cast("double").as("fill_opacity"),
        col("folder_id"),
        lit(null).cast("boolean").as("visible"),
        lit(null).cast("boolean").as("label_visible"),
        when(col("geom_type").isNotNull,
          struct(col("geom_type").as("type"), col("coords").as("coordinates")))
          .as("geometry"))
      .drop("geom_type", "coords")
  }

  test("geometry-less and folder features are dropped from the main flow") {
    val out = CalTopo.mainFlow(handRows).select("id").collect().map(_.getString(0))
    assert(out.toSet == Set("m1", "m2", "s1"))
  }

  test("folder dim extracts folders regardless of geometry") {
    val dim = CalTopo.folderDim(handRows).collect()
    assert(dim.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("F1", "My Folder")))
  }

  test("4-component coordinates truncate to 3, idempotently") {
    val df = CalTopo.coordTruncate(
      CalTopo.projectNest(CalTopo.mainFlow(handRows)))
    val m1 = df.filter(col("id") === "m1")
      .select(col("geometry.coordinates")).first().getString(0)
    assert(m1 == "[10.5,20.25,100.0]")
    // LineString: every position truncated
    val s1 = df.filter(col("id") === "s1")
      .select(col("geometry.coordinates")).first().getString(0)
    assert(s1 == "[[0.0,0.0,5.0],[1.0,1.0,6.0]]")
    // idempotent: truncating again is a no-op
    val twice = CalTopo.coordTruncate(df).filter(col("id") === "m1")
      .select(col("geometry.coordinates")).first().getString(0)
    assert(twice == m1)
    // 2-component point untouched
    val m2 = df.filter(col("id") === "m2")
      .select(col("geometry.coordinates")).first().getString(0)
    assert(m2 == "[1.0,2.0]")
  }

  test("rank-4 MultiPolygon truncates every position; GeometryCollection falls back to the generic walk") {
    import spark.implicits._
    val rows = Seq(
      ("mp1", "MultiPolygon",
        "[[[[1.0,2.0,3.0,4.0],[5.0,6.0,7.0,8.0]]],[[[9.0,10.0,11.0,12.0]]]]"),
      // GeometryCollection-style nesting: geometry objects embedding
      // coordinate arrays — handled by the string-level coordEach analog
      ("gc1", "GeometryCollection",
        """[{"type":"Point","coordinates":[1.0,2.0,3.0,4.0]},{"type":"LineString","coordinates":[[5.0,6.0,7.0,8.0],[9.0,10.0,11.0,12.0]]}]""")
    ).toDF("id", "gt", "coords")
      .select(col("id"),
        struct(col("gt").as("type"), col("coords").as("coordinates"))
          .as("geometry"))
    val out = CalTopo.coordTruncate(rows)
      .select(col("id"), col("geometry.coordinates"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("mp1") ==
      "[[[[1.0,2.0,3.0],[5.0,6.0,7.0]]],[[[9.0,10.0,11.0]]]]")
    assert(out("gc1") ==
      """[{"type":"Point","coordinates":[1.0,2.0,3.0]},{"type":"LineString","coordinates":[[5.0,6.0,7.0],[9.0,10.0,11.0]]}]""")
    // last position of a MultiPolygon reaches the last ring of the last poly
    val lp = CalTopo.coordTruncate(rows).filter(col("id") === "mp1")
      .select(CalTopo.lastPosition(col("geometry"))).first().getSeq[Double](0)
    assert(lp == Seq(9.0, 10.0, 11.0))
  }

  test("marker-color: set => '#'-prefixed + opacity 1 + removed from metadata; empty string untouched (JS falsy)") {
    val df = CalTopo.pointEnrich(
      CalTopo.projectNest(CalTopo.mainFlow(handRows)))
    val m1 = df.filter(col("id") === "m1")
      .select(col("properties.marker_color"), col("properties.marker_opacity"),
        col("properties.metadata.marker_color"), col("properties.type"))
      .first()
    assert(m1.getString(0) == "#FF0000")
    assert(m1.getDouble(1) == 1.0)
    assert(m1.isNullAt(2))
    assert(m1.getString(3) == "u-d-p")
    val m2 = df.filter(col("id") === "m2")
      .select(col("properties.marker_color"), col("properties.metadata.marker_color"))
      .first()
    assert(m2.isNullAt(0)) // empty string is falsy: NOT prefixed
    assert(m2.getString(1) == "")
  }

  test("A9 null-style values NULLIFY (pinned divergence from JS String(null)='null' / Number(null)=0)") {
    // The reference (task.ts:116-120) copies style fields through JS
    // String()/Number(): a present-but-null fill would become the literal
    // string "null" and a null numeric opacity would become 0. The engine
    // DELIBERATELY nullifies instead (operators/CalTopo.scala:14-21):
    // "null"-the-string and 0-opacity are corrupt style data no consumer
    // wants, and schema-valid CalTopo exports never exercise the branch.
    // This spec pins the chosen behavior on an explicit null-style row so
    // the divergence is tested contract, not a comment (VERDICT r3 item 6).
    val row = CalTopo.enrichProperties(CalTopo.projectNest(
        CalTopo.mainFlow(handRows)))
      .filter(col("id") === "s1") // its fill/stroke/opacities are all null
      .select(
        col("properties.fill"), col("properties.fill_opacity"),
        col("properties.stroke"), col("properties.stroke_opacity"),
        col("properties.stroke_width"))
      .collect().head
    (0 until 5).foreach { i =>
      assert(row.isNullAt(i),
        s"null style field $i must stay NULL (never JS 'null'/0 coercion)")
    }
  }

  test("A9 strict-JS arm: presence-gated String(null)/Number(null) coercion over raw wire JSON") {
    // The other side of the pinned divergence above (VERDICT r4 item 7):
    // with Config.strictJsSemantics the reference's task.ts:116-120
    // behavior is reproduced exactly — a PRESENT key always copies,
    // coercing null to "null" (String fields) / 0 (Number fields), JS
    // Number('')=0, non-numeric -> NaN; an ABSENT key still yields null.
    import spark.implicits._
    val raw = Seq(
      ("a", """{"fill":"#f00","fill-opacity":"0.5"}"""),  // plain values
      ("b", """{"fill":null,"fill-opacity":null}"""),     // present-null
      ("c", """{"stroke-width":""}"""),                   // Number('') = 0
      ("d", """{"stroke-opacity":"abc"}"""),              // Number junk = NaN
      ("e", """{}""")).toDF("id", "props")                // absent = no copy
    val s = CalTopo.styleCastsStrictJs(col("props"))
    val got = raw.select(col("id"),
        s.getField("fill").as("fill"),
        s.getField("fill_opacity").as("fo"),
        s.getField("stroke_opacity").as("so"),
        s.getField("stroke_width").as("sw"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("a").getString(1) == "#f00" && got("a").getDouble(2) == 0.5)
    assert(got("b").getString(1) == "null", "String(null) must be 'null'")
    assert(got("b").getDouble(2) == 0.0, "Number(null) must be 0")
    assert(got("c").getDouble(4) == 0.0, "Number('') must be 0")
    assert(got("d").getDouble(3).isNaN, "Number(junk) must be NaN")
    (1 to 4).foreach(i => assert(got("e").isNullAt(i), "absent key: no copy"))
  }

  test("A9 dispatch: strictJsSemantics selects the JS arm, default keeps nullify (both pinned)") {
    // s1's typed fill/opacities are all null; its wire JSON says the keys
    // were PRESENT (value null). The two config arms must disagree in
    // exactly the reference-documented way.
    val rawJson = lit("""{"fill":null,"fill-opacity":null,"stroke":null,"stroke-opacity":null,"stroke-width":null}""")
    val base = CalTopo.projectNest(CalTopo.mainFlow(handRows))
      .filter(col("id") === "s1")
    def styleRow(cfg: graft.Config) =
      CalTopo.enrichProperties(base, cfg, rawJson)
        .select(col("properties.fill"), col("properties.fill_opacity"),
          col("properties.stroke"), col("properties.stroke_opacity"),
          col("properties.stroke_width"))
        .collect().head
    val strict = styleRow(graft.Config("x", strictJsSemantics = true))
    assert(strict.getString(0) == "null" && strict.getString(2) == "null")
    assert(strict.getDouble(1) == 0.0 && strict.getDouble(3) == 0.0 &&
      strict.getDouble(4) == 0.0)
    val dflt = styleRow(graft.Config("x"))
    (0 until 5).foreach(i => assert(dflt.isNullAt(i),
      "default arm must keep the engine's nullify semantics"))
    // and the flag parses from env like every other config knob
    assert(Config.fromEnv(Map("SHARE_ID" -> "x", "GRAFT_STRICT_JS" -> "true"))
      .strictJsSemantics)
    assert(!Config.fromEnv(Map("SHARE_ID" -> "x")).strictJsSemantics)
  }

  test("ico/icon quirk (task.ts:121): presence-gated JS String() coercion over raw wire JSON") {
    // `if (metadata.ico !== undefined) icon = String(metadata.icon)` —
    // the one reference behavior typed columns can't carry (absent==null
    // in parquet); the map-typed decode of the RAW properties JSON keeps
    // key presence observable, so the quirk is modeled and pinned here,
    // JS coercions included (VERDICT r3 §missing.3).
    import spark.implicits._
    val raw = Seq(
      ("a", """{"ico":"x","icon":"pin"}"""), // both present -> icon value
      ("b", """{"ico":"x","icon":null}"""),  // icon null -> String(null)
      ("c", """{"ico":"x"}"""),              // icon absent -> String(undefined)
      ("d", """{"icon":"pin"}"""),           // no ico -> quirk does not fire
      ("e", """{"ico":null,"icon":"pin"}"""),// null ico is still DEFINED in JS
      ("f", """{}""")).toDF("id", "props")
    val got = raw
      .select(col("id"), CalTopo.icoIconQuirk(col("props")).as("icon_out"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("a") == Some("pin"))
    assert(got("b") == Some("null"))
    assert(got("c") == Some("undefined"))
    assert(got("d") == None)
    assert(got("e") == Some("pin"))
    assert(got("f") == None)
  }

  test("falsy description coalesces to empty remarks") {
    val df = CalTopo.enrichProperties(
      CalTopo.projectNest(CalTopo.mainFlow(handRows)))
    val remarks = df.select(col("id"), col("properties.remarks"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(remarks("m1") == "d")
    assert(remarks("m2") == "") // empty -> empty
  }

  test("folder join: resolving folderId gets '/'-prefixed path; dangling/missing get none") {
    val df = CalTopo.folderJoin(
      CalTopo.projectNest(CalTopo.mainFlow(handRows)),
      CalTopo.folderDim(handRows))
    val paths = df.select(col("id"), col("path"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(paths("m1").contains("/My Folder"))
    assert(paths("m2").isEmpty)      // null folderId
    assert(paths("s1").isEmpty)      // dangling folderId
  }

  test("flagship over driver data is non-empty and deterministic") {
    val a = CalTopo.flagship(CalTopoFeatures.build(spark, sfDir)).collect()
    val b = CalTopo.flagship(CalTopoFeatures.build(spark, sfDir)).collect()
    assert(a.nonEmpty)
    assert(a.sameElements(b))
  }
}
