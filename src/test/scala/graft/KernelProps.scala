package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.operators.TextOps

/** Property-based coverage of the row-local text kernels (the pure
  * functions behind the zero-shuffle repNgrams / tfidf scans) — naive
  * recounts over arbitrary token sequences, not just the fixture.
  */
object KernelProps extends Properties("graft.kernels") {

  // small alphabet so collisions (repeated bigrams/terms) actually occur
  private val tokensGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "ab"))

  property("bigramFacts matches a naive sliding recount") =
    Prop.forAll(tokensGen) { t =>
      val got = TextOps.bigramFacts(t)
      if (t.length < 2) got.isEmpty
      else {
        val naive = t.sliding(2).map(_.mkString(" ")).toList
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        got.contains((naive.values.sum, naive.size.toLong,
          naive.values.max))
      }
    }

  property("bigramFacts invariants: distinct ≤ total, top ≤ total," +
    " distinct·top ≥ total") =
    Prop.forAll(tokensGen.suchThat(_.length >= 2)) { t =>
      val Some((n, nd, top)) = TextOps.bigramFacts(t)
      nd >= 1 && top >= 1 && nd <= n && top <= n && nd * top >= n
    }

  property("termFreqs matches groupBy and sums to the token count") =
    Prop.forAll(tokensGen) { t =>
      val got = TextOps.termFreqs(t).toMap
      val naive = t.groupBy(identity).view.mapValues(_.size.toLong).toMap
      got == naive && got.values.sum == t.length.toLong
    }

  property("null-safe: both kernels emit nothing for null input") =
    Prop {
      TextOps.bigramFacts(null).isEmpty && TextOps.termFreqs(null).isEmpty
    }
}
