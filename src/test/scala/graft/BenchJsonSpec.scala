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

  test("recheck entry: successful rerun parses with rerun + window fields") {
    val n = parse(Bench.recheckJson("q\"1", 1.234, 0.5,
      Right(Bench.Rep(0.456, "2.5", 0.52, 0.1)), 0.55)).get("q\"1")
    assert(n.get("median").asDouble() == 1.23)
    assert(n.get("floor").asDouble() == 0.5)
    assert(n.get("rerun").asDouble() == 0.46)
    assert(n.get("rerun_load").asText() == "2.5")
    assert(n.get("rerun_util").asDouble() == 0.52)
    assert(n.get("rerun_steal").asDouble() == 0.1)
    assert(n.get("window").asText() == "quiet")
  }

  test("recheck entry: hot-window rerun annotates itself (r16 task 4)") {
    // the judge-r15 scenario: a same-window rerun came back WORSE
    // (8.51 → 12.02 vs floor 2.05) and shipped as if it were
    // confirmation — with the rerun's util at a third of the entry's
    // in-run baseline the entry must carry window:"hot"
    val n = parse(Bench.recheckJson("q1", 8.51, 2.05,
      Right(Bench.Rep(12.02, "4.0", 0.18, 0.2)), 0.55)).get("q1")
    assert(n.get("window").asText() == "hot")
    // steal alone classifies hot even when util looks clean
    val s = parse(Bench.recheckJson("q1", 8.51, 2.05,
      Right(Bench.Rep(12.02, "4.0", 0.55, 7.5)), 0.55)).get("q1")
    assert(s.get("window").asText() == "hot")
  }

  test("recheck entry: failed rerun ships rerun:null + rerun_err") {
    val n = parse(Bench.recheckJson("q1", 1.0, 0.4,
      Left("""boom "quoted" \ and control""" + "\n"), 0.5)).get("q1")
    assert(n.get("rerun").isNull,
      "a failed confirming rerun must ship as null, not vanish")
    assert(n.get("rerun_err").asText().startsWith("boom \"quoted\""))
  }

  test("regressed entry: min rides along; failed rerun still parses") {
    val ok = parse(Bench.regressedJson("a", 2.0, 0.9, 1.9,
      Right(Bench.Rep(0.95, "1.1", 0.4, 0.0)), 0.42)).get("a")
    assert(ok.get("min").asDouble() == 1.9)
    assert(ok.get("rerun").asDouble() == 0.95)
    assert(ok.get("window").asText() == "quiet")
    val ko = parse(Bench.regressedJson("a", 2.0, 0.9, 1.9,
      Left("kaput"), 0.42)).get("a")
    assert(ko.get("min").asDouble() == 1.9)
    assert(ko.get("rerun").isNull)
    assert(ko.get("rerun_err").asText() == "kaput")
  }

  test("windowClass: steal or a util drop vs baseline is hot; no " +
    "probes is unknown, never a false quiet") {
    // quiet: probes present and clean
    assert(Bench.windowClass(0.5, 0.55, 0.2) == "quiet")
    // hypervisor steal past the calibrated bound is hot outright
    assert(Bench.windowClass(0.5, 0.55, Bench.HotStealPct) == "hot")
    // util well under the SAME entry's in-run baseline is hot — the
    // ratio form is query-shape-free (a serial-phase entry has low
    // absolute util in every window)
    assert(Bench.windowClass(0.2, 0.55, 0.0) == "hot")
    // no baseline → util can't classify alone; steal still can
    assert(Bench.windowClass(0.2, -1.0, 0.0) == "quiet")
    // both probes unavailable → unknown (an artifact reader must not
    // mistake a probe-less platform for a measured-quiet window)
    assert(Bench.windowClass(-1.0, 0.5, -1.0) == "unknown")
    assert(Bench.windowClass(-1.0, -1.0, 9.9) == "hot")
  }

  test("utilOf / stealPctOf: bracketing math and unavailable-probe " +
    "sentinels") {
    // 2 cores, 1s wall, 1.5s of JVM CPU → 75% of the machine
    assert(Bench.utilOf(0L, 1500000000L, 1000000000L, 2) == 0.75)
    assert(Bench.utilOf(-1L, 10L, 1000000000L, 2) == -1.0)
    assert(Bench.utilOf(0L, 10L, 0L, 2) == -1.0)
    // 50 steal ticks over 1000 elapsed → 5%
    assert(Bench.stealPctOf((100L, 10000L), (150L, 11000L)) == 5.0)
    assert(Bench.stealPctOf((-1L, -1L), (150L, 11000L)) == -1.0)
    assert(Bench.stealPctOf((100L, 10000L), (100L, 10000L)) == -1.0)
  }

  test("probes read on this platform: procCpuNs advances, cpuStat " +
    "has monotone totals") {
    // the real /proc/stat + MX-bean path (Linux CI): burning a little
    // CPU must advance process CPU time, and total ticks never regress
    val c0 = Bench.procCpuNs()
    val s0 = Bench.cpuStat()
    var x = 0L
    (1 to 20000000).foreach(i => x += i)
    assert(x > 0)
    val c1 = Bench.procCpuNs()
    val s1 = Bench.cpuStat()
    if (c0 >= 0) assert(c1 > c0, "process CPU time did not advance")
    if (s0._1 >= 0) {
      assert(s1._2 >= s0._2, "total ticks regressed")
      assert(s0._1 >= 0 && s1._1 >= s0._1, "steal ticks regressed")
    }
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

  test("warmup_sec: per-entry warmup seconds parse as a JSON object " +
    "(r17 — the session-cache warmup-boundary audit field)") {
    // bench_samples.json must carry the UNTIMED warmup cost per entry:
    // session caches move their build across the warmup boundary by
    // design, and without this field a round could shift arbitrary
    // work out of the timed reps unaudited (r16 VERDICT item 6)
    val n = om.readTree(s"""{"warmup_sec":${
      Bench.warmupJson(Seq("a\"1" -> 1.234, "b" -> 0.056))}}""")
      .get("warmup_sec")
    assert(n.isObject)
    assert(n.get("a\"1").asDouble() == 1.23)
    assert(n.get("b").asDouble() == 0.06)
    assert(om.readTree(s"""{"w":${Bench.warmupJson(Nil)}}""")
      .get("w").isObject)
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
