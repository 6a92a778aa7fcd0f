package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint: every bare `.localCheckpoint()` in `src/main` must be a
  * PINNED, per-call TRANSIENT cut (the class [[Materialize.session]]'s
  * scaladoc carves out: staged tables that are consumed and released
  * within the same call, where on executor loss the query retries and
  * rebuilds them — nothing outlives the call). Everything
  * session-cached or iterative goes through the `graft.materialize`
  * seam ([[Materialize.session]]/[[Materialize.sessionTruncating]]) so
  * a cluster's `reliable` conf reaches it; this spec freezes the
  * audited transient sites so a NEW bare cut fails commit-time until
  * it is reviewed — the same discipline CollectLintSpec applies to
  * `.collect()`. Source-level by design (a plan check can't tell a
  * conf-backed checkpoint from a hardwired one).
  */
class MaterializeLintSpec extends AnyFunSuite {

  /** file (repo-relative) → allowed bare `.localCheckpoint()` count,
    * each a within-call transient:
    *
    *  - Materialize (1): the [[Materialize.Local]] strategy definition
    *    itself — the seam, not a bypass of it.
    *  - Apriori (3): the two staged transaction tables (`tx`), each
    *    read TWICE within the same build (the frequent-item count and
    *    the basket filter — uncut, the candidate-generation input
    *    would recompute the lineitem⋈part join), and the rules path's
    *    gated-support cut feeding one `rulesFrom` expansion; all
    *    superseded when their cached consumer materializes under
    *    [[Materialize.session]] (the artifacts a session SERVES ride
    *    the conf seam; these are its build scaffolding).
    *  - Bitext (1): the bounded mining-batch shortlist, per call.
    *  - Curation (1): the corpus card's narrow (lang, source, n_tok)
    *    projection — four report passes read it within the call (r16).
    *  - Dedup (1): the recall audit's exact reference pair set —
    *    audit-only, per call.
    *  - Multimodal (1): the per-call frame-sample staging cut.
    *  - Similarity (2): the MMR / incremental shortlist cuts, consumed
    *    by the same call's greedy fold.
    *  - Warehouse (1): the z-order audit's per-call staged sample.
    */
  private val Pinned: Map[String, Int] = Map(
    "src/main/scala/graft/Materialize.scala" -> 1,
    "src/main/scala/graft/operators/Apriori.scala" -> 3,
    "src/main/scala/graft/operators/Bitext.scala" -> 1,
    "src/main/scala/graft/operators/Curation.scala" -> 1,
    "src/main/scala/graft/operators/Dedup.scala" -> 1,
    "src/main/scala/graft/operators/Multimodal.scala" -> 1,
    "src/main/scala/graft/operators/Similarity.scala" -> 2,
    "src/main/scala/graft/operators/Warehouse.scala" -> 1
  )

  test("every src/main .localCheckpoint() site is a pinned transient") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      s"run from the repo root (cwd=${System.getProperty("user.dir")})")
    val needle = ".localCheckpoint()"
    val found = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map { p =>
        val n = java.nio.file.Files.readString(p)
          .sliding(needle.length).count(_ == needle)
        p.toString -> n
      }
      .filter(_._2 > 0).toMap
    val drift = (found.keySet ++ Pinned.keySet).toSeq.sorted.flatMap {
      f =>
        val (got, want) = (found.getOrElse(f, 0), Pinned.getOrElse(f, 0))
        if (got == want) None
        else Some(s"$f: $got localCheckpoint() sites, $want pinned")
    }
    assert(drift.isEmpty,
      s"""bare localCheckpoint drift — session-cached/iterative state
         |must ride Materialize.session/sessionTruncating; pin only
         |reviewed within-call transients:
         |  ${drift.mkString("\n  ")}""".stripMargin)
  }

  test("every requireTruncating call site BINDS the resolved strategy") {
    // requireTruncating returns the concrete strategy (the Session
    // sentinel resolves there, at operator ENTRY — r15). The build has
    // no -Wvalue-discard, so a site written statement-style would
    // compile, silently keep using the UNRESOLVED parameter, and
    // reintroduce the per-round sentinel re-resolution hazard the
    // return value exists to close (conf=disk applying Disk inside an
    // iterative loop). Source lint: every call site outside the
    // defining file must read `val <name> = …requireTruncating(`.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val sites = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .filterNot(_.toString.endsWith("Materialize.scala"))
      .flatMap { p =>
        java.nio.file.Files.readAllLines(p).asScala.zipWithIndex
          .filter(_._1.contains("requireTruncating("))
          .map { case (l, i) => (s"$p:${i + 1}", l.trim) }
      }.toSeq
    // the iterative entries: 11 Graph forms + Dedup.clustersOf +
    // TextOps.bpeMergesOf (update when adding an iterative operator)
    assert(sites.size == 13,
      s"requireTruncating call-site drift (${sites.size} != 13):\n  " +
        sites.map(_._1).mkString("\n  "))
    val unbound = sites.filterNot(_._2.startsWith("val "))
    assert(unbound.isEmpty,
      "requireTruncating result discarded (the site keeps the " +
        s"unresolved strategy): ${unbound.mkString("; ")}")
  }
}
