package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench main itself is exercised by the driver; these pin the
  * pure pieces — the BENCH_FULL baseline parse the inflation guard
  * depends on (a silent mis-parse would disable the guard without any
  * visible signal).
  */
class BenchSpec extends AnyFunSuite {

  test("benchFullBaseline: parses queries_sec, ignores header numbers, " +
      "guards only at the recorded scale factor") {
    val f = java.nio.file.Files.createTempFile("bench_full", ".json")
    java.nio.file.Files.write(f,
      """{
        | "recorded_round": 11,
        | "sf": "/root/testdata/sf0.1",
        | "total_sec": 192.828,
        | "n_queries": 252,
        | "queries_sec": {
        |  "q1_pricing_summary": 0.466,
        |  "sql_recursive": 8.203
        | }
        |}""".stripMargin.getBytes("UTF-8"))
    val m = Bench.benchFullBaseline("/root/testdata/sf0.1", f.toString)
    assert(m === Map("q1_pricing_summary" -> 0.466,
      "sql_recursive" -> 8.203))
    // an sf0.001 smoke must NOT be judged against sf0.1 numbers
    assert(Bench.benchFullBaseline("/root/testdata/sf0.001", f.toString)
      === Map.empty)
    java.nio.file.Files.delete(f)
  }

  test("benchFullBaseline: the committed artifact parses and covers " +
      "the headline set") {
    val m = Bench.benchFullBaseline("/root/testdata/sf0.1",
      "BENCH_FULL.json")
    assert(m.nonEmpty, "committed BENCH_FULL.json must parse")
    val missing = Bench.Headline.filterNot(m.contains)
    assert(missing.isEmpty,
      s"headline queries missing from BENCH_FULL baseline: $missing")
  }

  test("benchFullBaseline: missing file degrades to no-guard") {
    assert(Bench.benchFullBaseline("/root/testdata/sf0.1",
      "/nonexistent/nope.json") === Map.empty)
  }

  test("benchFullBaseline: a nested value inside queries_sec disables " +
      "the guard outright; trailing siblings after a flat object don't " +
      "leak in") {
    // r13 advice: nested members used to regex-leak into the map, and a
    // nested duplicate of a real query key (toMap last-wins) could
    // silently override the true baseline — nesting now means Map.empty
    val f = java.nio.file.Files.createTempFile("bench_full", ".json")
    java.nio.file.Files.write(f,
      """{
        | "sf": "/root/testdata/sf0.1",
        | "queries_sec": {
        |  "q1_pricing_summary": 0.466,
        |  "weird_future_entry": {"sql_recursive": 999.0, "note": 2},
        |  "sql_recursive": 8.203
        | }
        |}""".stripMargin.getBytes("UTF-8"))
    assert(Bench.benchFullBaseline("/root/testdata/sf0.1", f.toString)
      === Map.empty, "nested object inside queries_sec must fail loudly")
    // flat object + trailing sibling: parses, and the sibling's numbers
    // cannot override the true values
    java.nio.file.Files.write(f,
      """{
        | "sf": "/root/testdata/sf0.1",
        | "queries_sec": {
        |  "q1_pricing_summary": 0.466,
        |  "sql_recursive": 8.203
        | },
        | "appended_later": {"sql_recursive": 999.0}
        |}""".stripMargin.getBytes("UTF-8"))
    val m = Bench.benchFullBaseline("/root/testdata/sf0.1", f.toString)
    assert(m === Map("q1_pricing_summary" -> 0.466,
      "sql_recursive" -> 8.203))
    java.nio.file.Files.delete(f)
  }
}
