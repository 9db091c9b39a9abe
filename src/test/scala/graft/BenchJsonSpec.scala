package graft

import org.scalatest.funsuite.AnyFunSuite

/** Forced-failure test of Bench's failure emitter (VERDICT r4 item 3):
  * a bench run that dies must leave a named, JSON-safe exception head in
  * bench_full.json, even when best-of-N absorbs the failure.
  */
class BenchJsonSpec extends AnyFunSuite {

  test("errorHead names the exception and the root cause's first line") {
    // the r4 shape: a SparkException wrapping a DAGScheduler failure whose
    // message is a multi-line stack head
    val root = new IllegalStateException(
      "Task 3 in stage 7 failed\n  long stack line two\n  line three")
    val e = new RuntimeException("Job aborted", root)
    val head = Bench.errorHead(e)
    assert(head.startsWith("RuntimeException <- IllegalStateException: "))
    assert(head.contains("Task 3 in stage 7 failed"))
    assert(!head.contains("line two"), s"must keep only the first line: $head")
    // uncaused exceptions keep a single class name
    assert(Bench.errorHead(new RuntimeException("plain"))
      == "RuntimeException: plain")
    // null messages must not NPE
    assert(Bench.errorHead(new RuntimeException(null: String))
      == "RuntimeException: ")
  }

  test("jsonString escapes quotes, backslashes, and control characters") {
    val hostile = "he said \"boom\\crash\"\nnext\tline"
    val out = Bench.jsonString(hostile)
    assert(out.head == '"' && out.last == '"')
    val body = out.substring(1, out.length - 1)
    // no raw quote, backslash-escaping intact, no control chars survive
    assert(!body.replace("\\\"", "").replace("\\\\", "").contains("\""))
    assert(!body.exists(_ < ' '))
    // and the composed failures entry still parses as a flat JSON object
    // shape (balanced quotes — a proxy for validity without a parser dep)
    val entry = s"""{"q":${Bench.jsonString("q_x")},"error":$out}"""
    assert(entry.count(_ == '"') % 2 == 0)
  }

  test("a failure's head is bounded even for enormous messages") {
    val huge = new RuntimeException("x" * 10000)
    assert(Bench.errorHead(huge).length < 300)
  }

  test("spin-normalized total scales by host contention and guards a bad spin") {
    // spin at the uncontended 1 s reference: identity
    assert(Bench.normalizedTotal(80.0, 1000.0) == 80.0)
    // a 1.5x-contended host (spin 1500 ms) normalizes DOWN toward what a
    // clean host would have measured; a fast host normalizes UP
    assert(math.abs(Bench.normalizedTotal(90.0, 1500.0) - 60.0) < 1e-9)
    assert(math.abs(Bench.normalizedTotal(60.0, 750.0) - 80.0) < 1e-9)
    // degenerate spin (clock trouble) must not divide by zero
    assert(Bench.normalizedTotal(80.0, 0.0) == 80.0)
    assert(Bench.normalizedTotal(80.0, -5.0) == 80.0)
  }

  test("compact stdout line is short, parseable-shaped, and fits the tail window with the detail line") {
    // VERDICT r7 item 6: every BENCH_r{3..7}.json recorded "parsed": null
    // because the single budgeted line overflowed the driver's 2 KB tail.
    // The compact line must carry the graded fields in ~150 chars, and
    // compact + budgeted detail + sbt's trailing "[success]" must fit.
    val line = Bench.compactLine(73.299, 111, 2, 757.4, 63.1,
      "/root/testdata/sf0.1")
    assert(line.length < 220, s"compact line too long: ${line.length}")
    assert(line.startsWith("{\"metric\":\"total\",\"value\":73.299,"))
    for (k <- Seq("\"nq\":111", "\"nretried\":2", "\"spin_ms\":757.400",
        "\"membw_ms\":63.100", "\"value_normalized\":", "\"sf\":"))
      assert(line.contains(k), s"missing $k in $line")
    assert(line.count(_ == '"') % 2 == 0 && line.last == '}')
    // window arithmetic: both lines + sbt tail inside 2000 chars
    assert(line.length + 1 + Bench.perQueryBudget + 1 + 60 < 2000)
  }

  test("host-contention spin marker measures fixed CPU work and scales with it") {
    // the marker must time genuine work: positive, and ~10x the iterations
    // takes materially longer (loose factor — this spec also runs on
    // contended hosts, which is the very condition the marker reports)
    val small = Bench.spinMarkerMs(20000000L)
    val large = Bench.spinMarkerMs(200000000L)
    assert(small > 0.0 && large > 0.0)
    assert(large > small * 2, s"spin not proportional to work: $small vs $large")
  }

  test("memory-bandwidth marker measures fixed traversal work and scales with it") {
    // r11: the host change showed totals can inflate 15-30% at a FASTER
    // spin — the second marker must expose a bandwidth-starved host from
    // the artifact alone. Same proportionality contract as the spin: 8x
    // the passes over the same array takes materially longer (loose
    // factor, spec runs on contended hosts too). Small array here — the
    // spec should not allocate 256 MB; main() uses the default size.
    val words = 4 << 20 // 32 MB
    val small = Bench.membwMarkerMs(passes = 2, words = words)
    val large = Bench.membwMarkerMs(passes = 16, words = words)
    assert(small > 0.0 && large > 0.0)
    assert(large > small * 2,
      s"membw not proportional to work: $small vs $large")
  }
}
