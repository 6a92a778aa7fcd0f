package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.operators.Apriori

/** Property-based coverage of the pure generator/hash logic (SURVEY.md
  * §5.3) — runs under sbt's native ScalaCheck support, no bridge needed.
  */
object GeneratorProps extends Properties("graft.generators") {

  private val itemsGen: Gen[List[String]] =
    Gen.choose(1, 10).flatMap { k =>
      Gen.pick(k, ('a' to 'z').map(_.toString)).map(_.sorted.toList)
    }

  property("subsetKeys emits 2^k - 1 distinct subsets") =
    Prop.forAll(itemsGen) { items =>
      val all = Apriori.subsetKeys(items).toList
      all.size == (1 << items.size) - 1 &&
        all.distinct.size == all.size
    }

  property("subsetKeys size>=2 count is 2^k - k - 1") =
    Prop.forAll(itemsGen) { items =>
      Apriori.subsetKeys(items).count(_._2 >= 2) ==
        (1 << items.size) - items.size - 1
    }

  property("every subset key is a sorted subsequence of its basket") =
    Prop.forAll(itemsGen) { items =>
      Apriori.subsetKeys(items).forall { case (key, k) =>
        val parts = key.split(" ").toList
        parts.length == k && parts == parts.sorted &&
          parts.forall(items.contains)
      }
    }

  property("antecedents partition the itemset, both sides non-empty") =
    Prop.forAll(itemsGen.suchThat(_.size >= 2)) { items =>
      val rules = Apriori.antecedents(items).toList
      rules.size == (1 << items.size) - 2 &&
        rules.forall { case (a, c) =>
          a.nonEmpty && c.nonEmpty &&
            (a.split(" ") ++ c.split(" ")).sorted.toList == items.sorted
        }
    }

  property("support monotonicity: shrinking a basket shrinks its subsets") =
    Prop.forAll(itemsGen.suchThat(_.size >= 2)) { items =>
      val sub = items.init
      val all = Apriori.subsetKeys(items).map(_._1).toSet
      Apriori.subsetKeys(sub).map(_._1).forall(all.contains)
    }

  private val binGen: Gen[Array[Byte]] =
    Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .map(_.toArray)

  property("resizeStub: output width is always the target") =
    Prop.forAll(binGen, Gen.choose(1, 32)) { (bin, t) =>
      graft.operators.Multimodal.resizeStub(bin, t).length == t
    }

  property("resizeStub: uniform input resizes to the constant") =
    Prop.forAll(Gen.choose(1, 200), Gen.choose(1, 32),
      Gen.choose(0, 255)) { (n, t, v) =>
      graft.operators.Multimodal.resizeStub(
        Array.fill[Byte](n)(v.toByte), t).forall(_ == v.toDouble)
    }

  property("resizeStub: every cell lies within the input byte range") =
    // independent of the span formula: whatever the buckets are, a mean
    // of bytes can never leave [min, max] of the input
    Prop.forAll(binGen.suchThat(_.length >= 1), Gen.choose(1, 32)) { (bin, t) =>
      val vals = bin.map(b => (b & 0xff).toDouble)
      val out = graft.operators.Multimodal.resizeStub(bin, t)
      out.forall(v => v >= vals.min && v <= vals.max)
    }

  property("resizeStub: every cell is exactly its span's mean") =
    Prop.forAll(binGen.suchThat(_.length >= 1), Gen.choose(1, 32)) { (bin, t) =>
      // recompute each span mean with the same int-sum / double-divide
      // order (comparing (s/len)*len to s instead would trip IEEE
      // non-roundtripping pairs like 29/7*7 = 28.999…96)
      val out = graft.operators.Multimodal.resizeStub(bin, t)
      (0 until t).forall { i =>
        val lo = (i.toLong * bin.length / t).toInt
        val hi = math.max(((i + 1).toLong * bin.length / t).toInt, lo + 1)
        val s = (lo until math.min(hi, bin.length))
          .map(j => (bin(j) & 0xff).toDouble).sum
        out(i) == s / (hi - lo)
      }
    }

}
