package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's flagged-entry JSON fragments, parsed with a real JSON
  * parser (Spark's shaded-in Jackson): a malformed `recheck`/
  * `regressed` entry would corrupt the ONE judged artifact line
  * exactly when the self-triage channel has something to say — and
  * the non-empty paths fire rarely enough (normally `{}`) that a full
  * bench run does not exercise them.
  */
class BenchJsonSpec extends AnyFunSuite {

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parse(fragment: String)
      : com.fasterxml.jackson.databind.JsonNode =
    om.readTree(s"{$fragment}")

  test("recheck entry: successful rerun parses with both rerun fields") {
    val n = parse(Bench.recheckJson("q\"1", 1.234, 0.5, Right((0.456, "2.5"))))
      .get("q\"1")
    assert(n.get("median").asDouble() == 1.23)
    assert(n.get("floor").asDouble() == 0.5)
    assert(n.get("rerun").asDouble() == 0.46)
    assert(n.get("rerun_load").asText() == "2.5")
  }

  test("recheck entry: failed rerun ships rerun:null + rerun_err") {
    val n = parse(Bench.recheckJson("q1", 1.0, 0.4,
      Left("""boom "quoted" \ and control""" + "\n"))).get("q1")
    assert(n.get("rerun").isNull,
      "a failed confirming rerun must ship as null, not vanish")
    assert(n.get("rerun_err").asText().startsWith("boom \"quoted\""))
  }

  test("regressed entry: min rides along; failed rerun still parses") {
    val ok = parse(Bench.regressedJson("a", 2.0, 0.9, 1.9,
      Right((0.95, "1.1")))).get("a")
    assert(ok.get("min").asDouble() == 1.9)
    assert(ok.get("rerun").asDouble() == 0.95)
    val ko = parse(Bench.regressedJson("a", 2.0, 0.9, 1.9,
      Left("kaput"))).get("a")
    assert(ko.get("min").asDouble() == 1.9)
    assert(ko.get("rerun").isNull)
    assert(ko.get("rerun_err").asText() == "kaput")
  }

  test("bench_floors.json: parses, every key is a live query, floors " +
    "positive, file and readFloors agree") {
    // the floors moved out of Bench.scala into data (r13 had to
    // recalibrate the hardcoded map wholesale, with BASELINE.md as a
    // drifting second copy) — this pins the data file's shape so a
    // recalibration edit or a query rename fails here, not in a
    // silent never-tripping (or always-tripping) triage channel
    val f = new java.io.File("bench_floors.json")
    assert(f.isFile, s"missing ${f.getAbsolutePath}")
    val root = om.readTree(f)
    assert(root.get("method").isTextual, "method provenance line required")
    val floors = root.get("floors")
    assert(floors != null && floors.isObject)
    val names = scala.jdk.CollectionConverters
      .IteratorHasAsScala(floors.fieldNames()).asScala.toSeq
    assert(names.nonEmpty && names.size >= 40,
      s"floor map suspiciously small: ${names.size}")
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    assert(unknown.isEmpty, s"floors for unknown queries: $unknown")
    names.foreach { n =>
      val e = floors.get(n)
      assert(e.get("floor").isNumber && e.get("floor").asDouble() > 0.0,
        s"$n floor must be a positive number")
      assert(e.get("measured").isTextual,
        s"$n needs its measured-round provenance tag")
    }
    val read = Bench.readFloors("bench_floors.json")
    assert(read.keySet == names.toSet)
    assert(names.forall(n =>
      read(n) == floors.get(n).get("floor").asDouble()))
  }

  test("readFloors: missing or malformed file disarms to empty, " +
    "never throws") {
    assert(Bench.readFloors("/nonexistent/bench_floors.json").isEmpty)
    val tmp = java.nio.file.Files.createTempFile("floors", ".json")
    java.nio.file.Files.write(tmp, "{not json".getBytes("UTF-8"))
    try assert(Bench.readFloors(tmp.toString).isEmpty)
    finally java.nio.file.Files.delete(tmp)
  }

  test("loadSummary: run-level ambient context for the compact line") {
    // the r15 self-classification fields — mean_load/max_load in both
    // contract lines (and the samples archive) let a bounded tail
    // capture say whether its window was hot without an A/B
    assert(Bench.loadSummary(Seq("1.0", "3.0", "2.0")) == ((2.0, 3.0)))
    // "-1" is load1()'s cannot-read sentinel; junk must be dropped, not
    // poison the mean
    assert(Bench.loadSummary(Seq("-1", "4.0", "nope")) == ((4.0, 4.0)))
    // no usable samples → the explicit no-context marker, never NaN
    // (NaN is not valid JSON — it would corrupt both contract lines)
    assert(Bench.loadSummary(Seq("-1", "x")) == ((-1.0, -1.0)))
    assert(Bench.loadSummary(Nil) == ((-1.0, -1.0)))
  }

  test("ms is locale-proof 2-decimal; q escapes the JSON specials") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY) // 0,12 locale
      assert(Bench.ms(0.1234) == "0.12")
    } finally java.util.Locale.setDefault(prev)
    assert(om.readTree(s"""{${Bench.q("a\"b\\c\nd")}: 1}""")
      .fieldNames().next() == "a\"b\\c\nd")
  }
}
