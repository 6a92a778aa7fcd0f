package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Schema pin for every `SparkEntry.queries` output: name:type per
  * column, in order, against a committed golden file.
  *
  * Why: the r10 BIGINT/fp9 hardening changed three operators' output
  * schemas and the suite only noticed via ClassCastExceptions in specs
  * that happened to decode those rows — with this pin, ANY schema
  * change (insert, reorder, widen, rename) fails ONE named test whose
  * diff says exactly which entry changed and how, before any decoding
  * spec trips over it. The driver's oracle gate also hash-compares
  * schemas, but only at round end; this runs in every `sbt test`.
  *
  * Intentional schema changes: rerun with
  * `SPARK_GRAFT_REGEN_SCHEMAS=1 sbt "testOnly graft.EntrySchemaSpec"`,
  * review the golden diff, commit it with the operator change.
  */
class EntrySchemaSpec extends SparkSpecBase {

  private val goldenPath = Paths.get("src/test/resources/entry_schemas.txt")

  private def currentSchemas: Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, Sf).schema
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
    }

  test("every entry's output schema matches the committed golden pin") {
    val cur = currentSchemas
    if (sys.env.contains("SPARK_GRAFT_REGEN_SCHEMAS")) {
      Files.createDirectories(goldenPath.getParent)
      Files.write(goldenPath,
        cur.map { case (n, s) => s"$n\t$s" }.asJava)
      fail(s"regenerated $goldenPath — review the diff and commit it")
    }
    assert(Files.exists(goldenPath),
      s"missing golden $goldenPath — generate with SPARK_GRAFT_REGEN_SCHEMAS=1")
    val golden = Files.readAllLines(goldenPath).asScala
      .filter(_.nonEmpty)
      .map { l => val Array(n, s) = l.split("\t", 2); n -> s }.toMap
    val drift = cur.flatMap { case (n, s) =>
      golden.get(n) match {
        case None => Some(s"NEW entry (pin it): $n\t$s")
        case Some(g) if g != s =>
          Some(s"$n\n  pinned:  $g\n  current: $s")
        case _ => None
      }
    } ++ golden.keySet.diff(cur.map(_._1).toSet).toSeq.sorted
      .map(n => s"REMOVED entry (un-pin it): $n")
    assert(drift.isEmpty,
      s"""entry output schemas drifted from the golden pin
         |(intentional? SPARK_GRAFT_REGEN_SCHEMAS=1 regenerates):
         |${drift.mkString("\n")}""".stripMargin)
  }
}
