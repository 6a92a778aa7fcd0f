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
