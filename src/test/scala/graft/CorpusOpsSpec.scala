package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.Row
import graft.operators.{Curation, Dedup, Relational, TextOps}

/** Round-4 corpus/relational additions (context chunking, duplicated-span
  * removal, blocklist scrub, TPC-H Q3/Q10/correlated-subquery shapes) vs
  * in-memory brute force.
  */
class CorpusOpsSpec extends SparkSpecBase {

  import spark.implicits._

  /** Mirror of Relational.dsum: shortest-repr double → DECIMAL(24,6)
    * HALF_UP, exact decimal sum, back to double.
    */
  private def dsum(xs: Seq[Double]): Double =
    xs.map(BigDecimal.decimal(_).setScale(6, RoundingMode.HALF_UP))
      .sum.toDouble

  // ---- TextOps.encodeOf / decodeOf ----

  test("decode(encode(x)) == x in-vocabulary; OOV positions become <unk>") {
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "cat dog cat")).toDF("doc_id", "text")
    // vocab covering every token → lossless round trip
    val vocabAll = TextOps.vocabulary(corpus, vocabSize = 100)
    val back = TextOps.decodeOf(TextOps.encodeOf(corpus, 100), vocabAll)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getString(1)).toMap
    assert(back == Map(1L -> "the cat sat on the mat",
      2L -> "the dog sat", 3L -> "cat dog cat"))
    // tiny vocab: top-2 by (count desc, token asc) = "cat"(3), "the"(3)
    val enc2 = TextOps.encodeOf(corpus, 2)
    val oov = enc2.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(oov == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    val back2 = TextOps.decodeOf(enc2, TextOps.vocabulary(corpus, 2))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back2(3L) == "cat <unk> cat")
    assert(back2(1L) == "the cat <unk> <unk> the <unk>")
  }

  test("roundtrip entry: unk count equals n_oov, token counts preserved") {
    val rt = TextOps.roundtrip(spark, Sf).collect()
    assert(rt.nonEmpty)
    rt.foreach { r =>
      val toks = r.getAs[String]("text_rt").split(" ", -1)
      assert(toks.length.toLong == r.getAs[Long]("n_tokens"))
      assert(toks.count(_ == TextOps.UnkToken).toLong == r.getAs[Long]("n_oov"))
    }
    // the lossy path only fires when the corpus vocabulary outgrows the
    // encode vocab (true at sf0.01+; sf0.001's fits inside 256) — when
    // it does, n_oov must be nonzero somewhere
    val nVocab = TextOps.wordCountOf(
      graft.Tables(spark, Sf, "documents").select("doc_id", "text"))
      .count()
    if (nVocab > TextOps.EncodeVocab) assert(rt.exists(_.getLong(2) > 0))
    else assert(rt.forall(_.getLong(2) == 0L))
  }

  // ---- Curation.snapshotDiffOf ----

  test("snapshot diff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "a b"), (2L, "c d"), (3L, "e f"))
      .toDF("doc_id", "text")
    val next = Seq((1L, "a b"), (2L, "X d"), (4L, "new doc"))
      .toDF("doc_id", "text")
    val got = Curation.snapshotDiffOf(old, next).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  // ---- Curation.bpeDriftOf ----

  test("bpeDriftOf on identical corpora reports same=true at every step") {
    val c = Seq((1L, "abab cd cd abab"), (2L, "ab cd")).toDF("doc_id", "text")
    val got = Curation.bpeDriftOf(c, c).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getBoolean(3)))
    got.foreach(r => assert(r.getString(1) == r.getString(2)))
  }

  test("bpeDriftOf flags a flipped top pair as drift at step 1") {
    // old: (a,b) dominates → step-1 merge "ab"; next: (c,d) dominates
    val old = Seq((1L, "ab ab ab cd")).toDF("doc_id", "text")
    val nxt = Seq((1L, "cd cd cd ab")).toDF("doc_id", "text")
    val byStep = Curation.bpeDriftOf(old, nxt).collect()
      .map(r => r.getAs[Long]("step") -> ((r.getAs[String]("merged_old"), r.getAs[String]("merged_new"),
        r.getAs[Boolean]("same")))).toMap
    assert(byStep(1L) == (("ab", "cd", false)))
  }

  test("bpeDriftOf dangles the deeper side's steps when one exhausts early") {
    // old exhausts after 1 merge; next runs 3 — FULL OUTER keeps 2..3
    val old = Seq((1L, "ab")).toDF("doc_id", "text")
    val nxt = Seq((1L, "abcd")).toDF("doc_id", "text")
    val rows = Curation.bpeDriftOf(old, nxt).collect()
      .map(r => r.getAs[Long]("step") -> ((Option(r.getAs[String]("merged_old")),
        Option(r.getAs[String]("merged_new")), r.getAs[Boolean]("same")))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L) == ((Some("ab"), Some("ab"), true)))
    assert(rows(2L) == ((None, Some("abc"), false)))
    assert(rows(3L) == ((None, Some("abcd"), false)))
  }

  test("bpeDrift fixture: old side is exactly bpeMerges; real drift exists") {
    val got = Curation.bpeDrift(spark, Sf).collect()
      .map(r => (r.getAs[Long]("step"), Option(r.getAs[String]("merged_old")),
        Option(r.getAs[String]("merged_new")), r.getAs[Boolean]("same"))).sortBy(_._1)
    val trained = TextOps.bpeMerges(spark, Sf).collect()
      .map(r => r.getAs[Long]("step") -> r.getAs[String]("merged")).toMap
    // every trained step appears with its merge on the old side
    trained.foreach { case (step, merged) =>
      val row = got.find(_._1 == step).get
      assert(row._2.contains(merged))
    }
    // the fabricated re-crawl genuinely drifts AND genuinely agrees
    assert(got.exists(!_._4))
    assert(got.exists(_._4))
  }

  // ---- Curation.chunkOf ----

  test("chunkOf covers every token with overlapping fixed-stride windows") {
    val text = (1 to 150).map(i => s"w$i").mkString(" ")
    val out = Curation.chunkOf(Seq((7L, text)).toDF("doc_id", "text"))
      .collect().map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("start"), r.getAs[Int]("n_tokens"),
        r.getAs[String]("chunk_text"))).sortBy(_._2)
    val starts = Seq(0L, 48L, 96L, 144L)
    assert(out.map(_._2).toSeq == starts)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    out.foreach { case (_, start, n, chunk) =>
      val want = (start.toInt + 1 to math.min(start.toInt + 64, 150))
        .map(i => s"w$i")
      assert(n == want.length)
      assert(chunk == want.mkString(" "))
    }
    // consecutive chunks share size − stride = 16 tokens of context
    assert(out(0)._4.split(" ").takeRight(16).toSeq ==
      out(1)._4.split(" ").take(16).toSeq)
  }

  test("chunkOf handles a single-token document as one chunk") {
    val out = Curation.chunkOf(Seq((1L, "solo")).toDF("doc_id", "text"))
      .collect()
    assert(out.length == 1)
    assert(out.head == Row(1L, 0L, 0L, 1, "solo"))
  }

  // ---- Dedup.spanDedupOf ----

  test("spanDedupOf removes cross-document spans, keeps unique ones in order") {
    val boiler = (1 to Dedup.SpanWidth).map(i => s"b$i").mkString(" ")
    val a = (1 to Dedup.SpanWidth).map(i => s"a$i").mkString(" ")
    val c = (1 to Dedup.SpanWidth).map(i => s"c$i").mkString(" ")
    val df = Seq(
      (1L, s"$a $boiler $c"), // unique + shared + unique
      (2L, s"$boiler"),       // nothing but the shared block
      (3L, s"$boiler $a2")    // shared + its own unique tail
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedupOf(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_blocks"), r.getAs[Long]("n_kept"),
        r.getAs[String]("clean_text")))).toMap
    assert(got(1L) == ((3L, 2L, s"$a $c")))
    assert(got(2L) == ((1L, 0L, "")))
    assert(got(3L) == ((2L, 1L, a2)))
  }

  private val a2 = (1 to Dedup.SpanWidth).map(i => s"d$i").mkString(" ")

  test("spanDedup matches brute force on the fixture corpus") {
    val docs = Tables(spark, Sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val w = Dedup.SpanWidth
    def blocks(text: String): Seq[String] =
      text.split(" ", -1).grouped(w).map(_.mkString(" ")).toSeq
    val df = docs.flatMap { case (id, t) => blocks(t).map(b => (b, id)) }
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).distinct.size }
    val want = docs.map { case (id, t) =>
      val bs = blocks(t)
      val kept = bs.filter(df(_) == 1)
      id -> ((bs.size.toLong, kept.size.toLong, kept.mkString(" ")))
    }.toMap
    val got = Dedup.spanDedup(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_blocks"), r.getAs[Long]("n_kept"),
        r.getAs[String]("clean_text")))).toMap
    assert(got == want)
  }

  test("packChunks equals the global ordered prefix sum over chunks") {
    val chunks = Curation.chunk(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"), r.getAs[Int]("n_tokens")))
      .sortBy(t => (t._1, t._2))
    var cum = 0L
    val want = chunks.map { case (d, c, n) =>
      val shard = cum / Curation.ShardBudget
      cum += n
      (d, c, n.toLong, shard)
    }.toSet
    val got = Curation.packChunks(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"), r.getAs[Long]("n_tokens"), r.getAs[Long]("shard")))
      .toSet
    assert(got == want)
    assert(want.map(_._4).size > 1, "fixture should fill several shards")
  }

  // ---- TextOps.badwordsOf ----

  test("vocabCoverage matches a brute-force ranked-frequency recount") {
    val counts = scala.collection.mutable.Map[String, Long]()
    graft.Tables(spark, Sf, "documents").select("text").collect()
      .foreach(_.getString(0).split(" ", -1)
        .foreach(w => counts(w) = counts.getOrElse(w, 0L) + 1))
    val ranked = counts.toSeq.sortBy { case (w, c) => (-c, w) }
    val total = ranked.map(_._2).sum
    val got = TextOps.vocabCoverage(spark, Sf).collect()
      .map(r => r.getAs[Long]("vocab_size") -> ((r.getAs[Long]("n_covered"), r.getAs[Double]("coverage")))).toMap
    assert(got.keySet == TextOps.CoverageVocabSizes.toSet)
    TextOps.CoverageVocabSizes.foreach { v =>
      val cov = ranked.take(v.toInt).map(_._2).sum
      assert(got(v) == ((cov, cov.toDouble / total.toDouble)), s"V=$v")
    }
    // the curve is monotone and actually bends on the fixture
    val covs = TextOps.CoverageVocabSizes.map(got(_)._2)
    assert(covs == covs.sorted && covs.head < covs.last)
  }

  test("sceneCuts equals a sequential per-doc replay of the jump rule") {
    import graft.operators.Multimodal
    val frames = Multimodal.audioEnergy(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx"), r.getAs[Long]("energy")))
    val got = Multimodal.sceneCuts(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("scene_id"), r.getAs[Long]("n_frames"), r.getAs[Int]("start_frame"),
        r.getAs[Long]("sum_energy"))).toSet
    val want = frames.groupBy(_._1).flatMap { case (doc, fs) =>
      var prev = Option.empty[Long]
      var scene = 0L
      fs.sortBy(_._2).map { case (_, idx, e) =>
        val cut = prev match {
          case None => true
          case Some(p) => math.abs(e - p) * 4 > p
        }
        if (cut) scene += 1
        prev = Some(e)
        (doc, scene, idx, e)
      }.groupBy { case (_, s, _, _) => s }.map { case (s, rows) =>
        (doc, s, rows.length.toLong, rows.map(_._3).min,
          rows.map(_._4).sum)
      }
    }.toSet
    assert(got == want)
    // every doc's scenes are dense from 1 and cover all its frames
    got.groupBy(_._1).foreach { case (doc, scenes) =>
      val ids = scenes.map(_._2).toSeq.sorted
      assert(ids == (1L to ids.length).toSeq, s"doc $doc")
      assert(scenes.toSeq.map(_._3).sum ==
        frames.count(_._1 == doc).toLong, s"doc $doc coverage")
    }
  }

  test("badwordsOf counts, scores and scrubs blocklisted tokens") {
    val df = Seq(
      (1L, "clean text with nothing listed here at all ok ok"),
      (2L, "slow start but then a dup appears and another dup")
    ).toDF("doc_id", "text")
    val got = TextOps.badwordsOf(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Int]("n_bad"), r.getAs[Double]("bad_ratio"),
        r.getAs[String]("scrubbed"), r.getAs[Boolean]("badwords_pass")))).toMap
    assert(got(1L) == ((0, 0.0,
      "clean text with nothing listed here at all ok ok", true)))
    val m = TextOps.MaskToken
    assert(got(2L) == ((3, 3.0 / 10.0,
      s"$m start but then a $m appears and another $m", false)))
  }

  test("badwords pass-rate on the fixture matches brute force") {
    val docs = Tables(spark, Sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val bad = TextOps.Blocklist.toSet
    val want = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val n = toks.count(bad)
      id -> ((n, n.toDouble / toks.length <= TextOps.BadRatioMax))
    }.toMap
    val got = TextOps.badwords(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Int]("n_bad"), r.getAs[Boolean]("badwords_pass")))).toMap
    assert(got == want)
    assert(want.values.exists(!_._2), "fixture should trip the gate somewhere")
  }

  // ---- Relational TPC-H shapes ----

  private lazy val orders = Tables(spark, Sf, "orders")
    .select($"o_orderkey", $"o_custkey", $"o_orderpriority", $"o_totalprice",
      org.apache.spark.sql.functions
        .unix_micros($"o_orderdate".cast("timestamp")).as("us"))
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getDouble(3), r.getLong(4)))

  test("shippingPriority matches brute force top-10") {
    val cut = Relational.ShipCutUs
    val cust = Tables(spark, Sf, "customer")
      .where($"c_mktsegment" === "BUILDING")
      .select("c_custkey").as[Long].collect().toSet
    val openOrders = orders.collect {
      case (ok, ck, pri, _, us) if us < cut && cust(ck) => ok -> ((us, pri))
    }.toMap
    val li = Tables(spark, Sf, "lineitem")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount",
        org.apache.spark.sql.functions
          .unix_micros($"l_shipdate".cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3)))
    val want = li.collect {
      case (ok, p, d, ship) if ship > cut && openOrders.contains(ok) =>
        ok -> p * (1.0 - d)
    }.groupBy(_._1).map { case (ok, xs) =>
      (ok, openOrders(ok)._1, openOrders(ok)._2, dsum(xs.map(_._2).toSeq))
    }.toSeq.sortBy { case (ok, _, _, rev) => (-rev, ok) }.take(10)
    val got = Relational.shippingPriority(spark, Sf).collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("order_us"), r.getAs[String]("o_orderpriority"), r.getAs[Double]("revenue")))
    assert(got.toSeq == want)
  }

  test("returnedCustomers matches brute force top-20") {
    val custKey = orders.map(o => o._1 -> o._2).toMap
    val cust = Tables(spark, Sf, "customer")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2),
        r.getDouble(3)))).toMap
    val nation = Tables(spark, Sf, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val li = Tables(spark, Sf, "lineitem")
      .where($"l_returnflag" === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = li.map { case (ok, p, d) => (custKey(ok), p * (1.0 - d)) }
      .groupBy(_._1).map { case (ck, xs) =>
        val (name, nk, bal) = cust(ck)
        (ck, name, bal, nation(nk), dsum(xs.map(_._2).toSeq), xs.size.toLong)
      }.toSeq.sortBy { case (ck, _, _, _, rev, _) => (-rev, ck) }.take(20)
    val got = Relational.returnedCustomers(spark, Sf).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[String]("c_name"), r.getAs[Double]("c_acctbal"),
        r.getAs[String]("n_name"), r.getAs[Double]("revenue"), r.getAs[Long]("n_returned")))
    assert(got.toSeq == want)
  }

  test("collocations matches brute-force lift ranking") {
    val texts = Tables(spark, Sf, "documents")
      .select("text").as[String].collect()
    val uni = texts.flatMap(_.split(" ", -1))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val bi = texts.flatMap(_.split(" ", -1).sliding(2).filter(_.length == 2))
      .map(p => (p(0), p(1)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val m = bi.values.sum
    val want = bi.toSeq.map { case ((w1, w2), cxy) =>
      (w1, w2, cxy,
        cxy.toDouble * m.toDouble / (uni(w1).toDouble * uni(w2).toDouble))
    }.sortBy { case (w1, w2, _, lift) => (-lift, w1, w2) }
      .take(TextOps.TopCollocations)
    val got = TextOps.collocations(spark, Sf).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"), r.getAs[Long]("c_xy"),
        r.getAs[Double]("lift")))
    assert(got.toSeq == want)
  }

  test("bigramNext picks each word's most likely successor exactly") {
    val texts = Tables(spark, Sf, "documents")
      .select("text").as[String].collect()
    val bi = texts.flatMap(_.split(" ", -1).sliding(2).filter(_.length == 2))
      .map(p => (p(0), p(1)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val want = bi.groupBy(_._1._1).map { case (w1, m) =>
      val den = m.values.sum
      val ((_, w2), cnt) = m.minBy { case ((_, n), c) => (-c, n) }
      (w1, w2, cnt, cnt.toDouble / den.toDouble)
    }.toSet
    val got = TextOps.bigramNext(spark, Sf).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("next_word"), r.getAs[Long]("c_xy"),
        r.getAs[Double]("p"))).toSet
    assert(got == want)
    assert(got.forall { case (_, _, _, p) => p > 0.0 && p <= 1.0 })
  }

  test("kneserNey matches the brute-force exact-rational smoothing") {
    val texts = Tables(spark, Sf, "documents")
      .select("text").as[String].collect()
    val bi = texts.flatMap(_.split(" ", -1).sliding(2).filter(_.length == 2))
      .map(p => (p(0), p(1)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val cx = bi.groupBy(_._1._1).map { case (v, m) => v -> m.values.sum }
    val n1f = bi.groupBy(_._1._1).map { case (v, m) => v -> m.size.toLong }
    val n1b = bi.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val nt = bi.size.toLong
    val want = bi.toSeq.map { case ((v, w), c) =>
      val num = BigInt(4 * c - 3) * nt + BigInt(3 * n1f(v)) * n1b(w)
      val den = BigInt(4 * cx(v)) * nt
      (v, w, c, cx(v), n1f(v), n1b(w),
        ((num * TextOps.KnScale) / den).toLong)
    }.sortBy { case (v, w, c, _, _, _, _) => (-c, v, w) }
      .take(TextOps.KnTopK)
    val got = TextOps.kneserNey(spark, Sf).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"), r.getAs[Long]("c_xy"),
        r.getAs[Long]("c_x"), r.getAs[Long]("n1_fwd"), r.getAs[Long]("n1_bwd"), r.getAs[Long]("p_scaled")))
    assert(got.toSeq == want)
    // a proper probability at the fixed point, never clipped to zero
    // (observed bigrams have c ≥ 1 so the discount never exhausts them)
    want.foreach { case (_, _, _, _, _, _, ps) =>
      assert(ps > 0L && ps <= TextOps.KnScale)
    }
  }

  test("vocabDrift replays the parity-split mover ranking") {
    val docsT = Tables(spark, Sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = docsT.flatMap { case (id, t) =>
      t.split(" ", -1).map(w => (w, id % 2 == 0)) }
      .groupBy(_._1).map { case (w, xs) =>
        (w, xs.count(_._2).toLong, xs.count(!_._2).toLong) }
    val want = counts.toSeq
      .map { case (w, a, b) => (w, a, b, b - a) }
      .sortBy { case (w, _, _, d) => (-math.abs(d), w) }
      .take(TextOps.VocabDriftTopK)
    val got = TextOps.vocabDrift(spark, Sf).collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("c_base"), r.getAs[Long]("c_cur"),
        r.getAs[Long]("delta"))).toSeq
    assert(got == want)
    // top-k compiles to bounded heaps, never a vocabulary sort
    val plan = TextOps.vocabDrift(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("kneserNey conditional mass: Σ_w P(w|v) ≤ 1 per context") {
    // the discounted + continuation-interpolated masses of a context's
    // OBSERVED successors must not exceed 1 (the remainder is the
    // unseen-successor reserve); floor rounding only helps
    val texts = Tables(spark, Sf, "documents")
      .select("text").as[String].collect()
    val bi = texts.flatMap(_.split(" ", -1).sliding(2).filter(_.length == 2))
      .map(p => (p(0), p(1)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val cx = bi.groupBy(_._1._1).map { case (v, m) => v -> m.values.sum }
    val n1f = bi.groupBy(_._1._1).map { case (v, m) => v -> m.size.toLong }
    val n1b = bi.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val nt = bi.size.toLong
    val mass = bi.toSeq.map { case ((v, w), c) =>
      v -> ((BigInt(4 * c - 3) * nt + BigInt(3 * n1f(v)) * n1b(w))
        * TextOps.KnScale / (BigInt(4 * cx(v)) * nt))
    }.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sum }
    assert(mass.nonEmpty)
    mass.foreach { case (v, m) =>
      assert(m <= BigInt(TextOps.KnScale),
        s"context '$v' over-allocates: $m")
    }
  }

  test("knScore replays the per-doc weighted mean and arg-min exactly") {
    val docsT = Tables(spark, Sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bi = docsT.flatMap(_._2.split(" ", -1).sliding(2)
        .filter(_.length == 2)).map(p => (p(0), p(1)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val cx = bi.groupBy(_._1._1).map { case (v, m) => v -> m.values.sum }
    val n1f = bi.groupBy(_._1._1).map { case (v, m) => v -> m.size.toLong }
    val n1b = bi.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val nt = bi.size.toLong
    def ps(v: String, w: String, c: Long): Long =
      ((BigInt(4 * c - 3) * nt + BigInt(3 * n1f(v)) * n1b(w))
        * TextOps.KnScale / (BigInt(4 * cx(v)) * nt)).toLong
    val want = docsT.flatMap { case (id, text) =>
      val trans = text.split(" ", -1).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))).toSeq
      if (trans.isEmpty) None else {
        val scored = trans.groupBy(identity)
          .map { case ((v, w), xs) =>
            (v, w, xs.size.toLong, ps(v, w, bi((v, w)))) }
        val n = scored.map(_._3).sum
        val mn = scored.map { case (v, w, _, p) => (p, v, w) }.min
        val sp = scored.map { case (_, _, c, p) => BigInt(c) * p }.sum
        Some((id, n, mn._2, mn._3, mn._1, sp.toDouble / n.toDouble))
      }
    }.sortBy(_._1).toSeq
    val got = TextOps.knScore(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_trans"), r.getAs[String]("min_w1"),
        r.getAs[String]("min_w2"), r.getAs[Long]("min_p_scaled"), r.getAs[Double]("mean_p_scaled")))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("sourceStats matches brute-force per-source accounting") {
    val docs = Tables(spark, Sf, "documents")
      .select("source", "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val en = Set("the", "a", "of", "and", "to", "in", "is",
      "that", "it", "for")
    def pass(text: String): Boolean = {
      val t = text.split(" ", -1)
      val n = t.length.toDouble
      t.length >= 20 && t.length <= 1000 &&
        t.distinct.length / n >= 0.2 && t.count(en) / n <= 0.5
    }
    val want = docs.groupBy(_._1).map { case (src, xs) =>
      (src, xs.length.toLong,
        xs.map(_._3.split(" ", -1).length.toLong).sum,
        xs.map(_._2).distinct.length.toLong,
        xs.count(d => pass(d._3)).toLong)
    }.toSet
    val got = TextOps.sourceStats(spark, Sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_langs"),
        r.getAs[Long]("n_pass"))).toSet
    assert(got == want)
    assert(want.size > 1)
  }

  test("trailingSpend matches a brute-force range frame") {
    val want = orders.groupBy(_._2).toSeq.flatMap { case (_, os) =>
      os.map { case (ok, ck, _, _, us) =>
        val frame = os.filter(o =>
          o._5 >= us - Relational.TrailingUs && o._5 <= us)
        val spend = dsum(frame.map(_._4).toSeq)
        (ok, ck, us, spend, frame.length.toLong)
      }
    }.toSet
    val got = Relational.trailingSpend(spark, Sf).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("o_custkey"), r.getAs[Long]("order_us"), r.getAs[Double]("trailing_spend"),
        r.getAs[Long]("n_recent"))).toSet
    assert(got == want)
    // windows genuinely accumulate: some order has >1 recent order
    assert(want.exists(_._5 > 1L))
  }

  test("customerOrdersDist counts zero-order customers") {
    val custs = Tables(spark, Sf, "customer")
      .select("c_custkey").as[Long].collect()
    val perCust = orders.groupBy(_._2).map { case (ck, os) =>
      ck -> os.length.toLong
    }
    val want = custs.map(ck => perCust.getOrElse(ck, 0L))
      .groupBy(identity).map { case (n, xs) => (n, xs.length.toLong) }.toSet
    val got = Relational.customerOrdersDist(spark, Sf).collect()
      .map(r => (r.getAs[Long]("n_orders"), r.getAs[Long]("n_custs"))).toSet
    assert(got == want)
    // no fixture customer has zero orders, so pin the outer-join zero
    // path on an in-memory pair: customers 1,2,3 with orders only for 1,1,3
    val dist = Relational.customerOrdersDistOf(
      Seq(1L, 2L, 3L).toDF("c_custkey"),
      Seq(1L, 1L, 3L).toDF("o_custkey"))
      .collect().map(r => (r.getAs[Long]("n_orders"), r.getAs[Long]("n_custs"))).toSet
    assert(dist == Set((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("embQuantize matches brute force, |q| ≤ 127, error ≤ half a step") {
    val vecs = Tables(spark, Sf, "embeddings").select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val want = vecs.flatMap { case (id, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).max
      v.zipWithIndex.map { case (x, i) =>
        val q = if (scale == 0.0) 0L
        else math.floor(x.toDouble * 127.0 / scale + 0.5).toLong
        (id, i.toLong, scale, q)
      }
    }.toSet
    val got = graft.operators.Similarity.embQuantize(spark, Sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("i"), r.getAs[Double]("scale"), r.getAs[Long]("q")))
      .toSet
    assert(got == want)
    assert(got.forall { case (_, _, _, q) => math.abs(q) <= 127 })
    // reconstruction stays within half a quantization step
    val byId = vecs.toMap
    got.foreach { case (id, i, scale, q) =>
      val back = q.toDouble * scale / 127.0
      assert(math.abs(back - byId(id)(i.toInt).toDouble)
        <= scale / 254.0 + 1e-12)
    }
  }

  test("int8TopK matches brute force and approximates the exact ranking") {
    import graft.operators.Similarity
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cosine(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val vecs = Tables(spark, Sf, "embeddings").select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def quant(v: Array[Float]): (Double, Array[Long]) = {
      val s = v.map(x => math.abs(x.toDouble)).max
      (s, v.map(x => if (s == 0.0) 0L
      else math.floor(x.toDouble * 127.0 / s + 0.5).toLong))
    }
    val q = vecs.map { case (id, v) => id -> quant(v) }.toMap
    val want = vecs.filter(_._1 < Similarity.NumQueries).flatMap {
      case (qid, _) =>
        val (qs, qq) = q(qid)
        vecs.filter(_._1 != qid).map { case (nid, _) =>
          val (ns, nq) = q(nid)
          val idot = qq.zip(nq).map { case (a, b) => a * b }.sum
          (qid, nid, idot.toDouble * qs * ns / 16129.0)
        }.sortBy { case (_, nid, s) => (-s, nid) }
          .take(Similarity.TopK).zipWithIndex
          .map { case ((a, b, s), i) => (a, b, s, i + 1) }
    }.toSet
    val got = Similarity.int8TopK(spark, Sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"), r.getAs[Double]("qdot"), r.getAs[Int]("rank")))
      .toSet
    assert(got == want)
    // the int8 ranking should broadly agree with the exact cosine one:
    // most of each query's exact top-k survives quantization
    val exact = vecs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val overlap = want.groupBy(_._1).map { case (qid, rows) =>
      val approx = rows.map(_._2)
      val truth = exact.keys.filter(_ != qid).toSeq
        .map(n => n -> cosine(exact(qid), exact(n)))
        .sortBy { case (n, s) => (-s, n) }.take(Similarity.TopK)
        .map(_._1).toSet
      approx.count(truth) / Similarity.TopK.toDouble
    }
    assert(overlap.sum / overlap.size >= 0.6,
      s"mean top-k overlap ${overlap.sum / overlap.size}")
  }

  test("featureDup pairs documents with equal quantized decoded features") {
    import graft.operators.Multimodal
    val docs = Tables(spark, Sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    def fingerprint(text: String): Seq[Long] = {
      val sums = Array.fill(8)(0L)
      text.take(2000).zipWithIndex.foreach { case (c, i) =>
        sums(i % 8) += c.toInt
      }
      sums.toSeq.map(_ / Multimodal.FeatureQuant)
    }
    val byFp = docs.map { case (id, t) => id -> fingerprint(t) }
      .groupBy(_._2).values.filter(_.length > 1)
    val want = byFp.flatMap { g =>
      val ids = g.map(_._1).sorted.toSeq
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val got = Multimodal.featureDup(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture should contain feature-level near-dups")
  }

  test("captionScore matches brute force; a planted media swap moves " +
      "only the swapped pair onto its cross-modal scores") {
    import graft.operators.Multimodal
    val texts = Tables(spark, Sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val embs = Tables(spark, Sf, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) e")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .toMap
    def mediaVec(text: String): Array[Double] =
      Multimodal.ByteHistogramDecoder.features(text.getBytes("UTF-8"))
        .map(_.toDouble)
    def pool(e: Array[Double]): Array[Double] =
      Array.tabulate(8)(g =>
        (0 until 8).foldLeft(0.0)((a, j) => a + e(g + 8 * j)))
    def quant(v: Array[Double]): (Double, Array[Long]) = {
      val s = v.foldLeft(0.0)((a, x) => math.max(a, math.abs(x)))
      (s, v.map(x =>
        if (s == 0.0) 0L else math.floor(x * 127.0 / s + 0.5).toLong))
    }
    def score(e: Array[Double], text: String): Double = {
      val (st, qt) = quant(pool(e))
      val (sm, qm) = quant(mediaVec(text))
      var acc = 0.0
      var i = 0
      while (i < qt.length) { acc += qt(i).toDouble * qm(i).toDouble; i += 1 }
      acc * st * sm / 16129.0
    }
    val got = Multimodal.captionScore(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Double]("cap_score"), r.getAs[Boolean]("aligned")))).toMap
    assert(got.keySet == (texts.keySet intersect embs.keySet))
    got.foreach { case (id, (s, al)) =>
      assert(s == score(embs(id), texts(id)), s"doc $id score")
      assert(al == (s > Multimodal.CaptionThreshold), s"doc $id aligned")
    }
    // the gate is non-trivial on the fixture
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
    // planted misalignment: swap the MEDIA of two docs whose feature
    // histograms differ, embeddings unchanged
    val ids = texts.keys.toSeq.sorted
    val a = ids.head
    val b = ids.find(i =>
      !mediaVec(texts(i)).sameElements(mediaVec(texts(a)))).get
    val swapped = texts.map { case (id, t) =>
      if (id == a) id -> texts(b)
      else if (id == b) id -> texts(a)
      else id -> t
    }
    val mfRows = swapped.toSeq.flatMap { case (id, t) =>
      Multimodal.ByteHistogramDecoder.features(t.getBytes("UTF-8"))
        .zipWithIndex.map { case (v, g) => (id, g, v) }
    }.toDF("doc_id", "grp", "byte_sum")
    val embDf = Tables(spark, Sf, "embeddings")
      .selectExpr("vec_id as doc_id", "embedding")
    val mis = Multimodal.captionScoreOf(spark, mfRows, embDf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("cap_score")).toMap
    // swapped keys score against the OTHER doc's media...
    assert(mis(a) == score(embs(a), texts(b)), "swapped pair a")
    assert(mis(b) == score(embs(b), texts(a)), "swapped pair b")
    // ...and every untouched pair is bit-identical to the base run
    (mis.keySet - a - b).foreach { id =>
      assert(mis(id) == got(id)._1, s"doc $id moved")
    }
  }

  test("funnel anchors each stage strictly after the previous one") {
    import graft.streaming.Streams
    // user 1: full ordered funnel; user 2: click BEFORE first view (must
    // not count) then purchase without a valid click; user 3: view only
    val us = 1000L * 1000
    val ev = Seq(
      (1L, 10 * us, 1L, "view", 0.0, "{}"),
      (2L, 20 * us, 1L, "click", 0.0, "{}"),
      (3L, 30 * us, 1L, "purchase", 0.0, "{}"),
      (4L, 5 * us, 2L, "click", 0.0, "{}"),
      (5L, 10 * us, 2L, "view", 0.0, "{}"),
      (6L, 20 * us, 2L, "purchase", 0.0, "{}"),
      (7L, 10 * us, 3L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", $"ts" * 1000) // ns, as the fixture surfaces
    val got = Streams.funnel(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(got(1L) == ((10 * us, Some(20 * us), Some(30 * us))))
    // user 2's 5s click precedes the first view → no click stage, and
    // therefore the purchase can't anchor either
    assert(got(2L) == ((10 * us, None, None)))
    assert(got(3L) == ((10 * us, None, None)))
  }

  test("retention matches the brute-force cohort triangle") {
    import graft.streaming.Streams
    val ev = Streams.withEventTime(Tables(spark, Sf, "events"))
      .select($"user_id", $"ts_us".as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / Streams.DayUs))
    val active = ev.distinct
    val cohort = active.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._2).min
    }
    val want = active.map { case (u, d) => (cohort(u), d - cohort(u)) }
      .groupBy(identity).map { case (k, xs) => (k._1, k._2, xs.length.toLong) }
      .toSet
    val got = Streams.retention(Tables(spark, Sf, "events")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.exists(_._2 > 0), "fixture should span multiple days")
  }

  test("aboveAvgOrders matches the correlated-subquery brute force") {
    val byCust = orders.groupBy(_._2)
    val want = byCust.toSeq.flatMap { case (_, os) =>
      val n = os.length
      val total = os.map(o => BigDecimal.decimal(o._4)
        .setScale(6, RoundingMode.HALF_UP)).sum
      os.collect {
        case (ok, ck, _, price, _)
          if BigDecimal.decimal(price).setScale(6, RoundingMode.HALF_UP)
            * n * 2 > total * 3 => (ok, ck, price, n.toLong)
      }
    }.toSet
    val got = Relational.aboveAvgOrders(spark, Sf).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("o_custkey"), r.getAs[Double]("o_totalprice"), r.getAs[Long]("n_orders")))
      .toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < orders.length)
  }

  test("bigOrders matches brute-force HAVING-then-join top-100") {
    val sumQty = Tables(spark, Sf, "lineitem")
      .select($"l_orderkey", $"l_quantity")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (ok, xs) => ok -> dsum(xs.map(_._2).toSeq) }
      .filter(_._2 > Relational.BigOrderQty)
    val custName = Tables(spark, Sf, "customer")
      .select("c_custkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = orders.collect {
      case (ok, ck, _, price, us) if sumQty.contains(ok) =>
        (ck, custName(ck), ok, us, price, sumQty(ok))
    }.sortBy { case (_, _, ok, _, price, _) => (-price, ok) }.take(100).toSeq
    val got = Relational.bigOrders(spark, Sf).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[String]("c_name"), r.getAs[Long]("o_orderkey"), r.getAs[Long]("order_us"),
        r.getAs[Double]("o_totalprice"), r.getAs[Double]("sum_qty"))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "fixture should contain big orders")
  }

  test("valueOutliers flags exactly the >2σ events, exact moments") {
    import graft.streaming.Streams
    val ev = Tables(spark, Sf, "events")
      .select($"event_id", $"user_id", $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = ev.groupBy(_._2).flatMap { case (_, es) =>
      val n = es.length.toLong
      val s1 = dsum(es.map(_._3).toSeq)
      val s2 = dsum(es.map(e => e._3 * e._3).toSeq)
      val mean = s1 / n.toDouble
      val varv = s2 / n.toDouble - mean * mean
      es.toSeq.collect {
        case (id, uid, v)
          if (v - mean) * (v - mean) > Streams.OutlierSigmaSq * varv =>
          (id, uid, v, n, mean, varv)
      }
    }.toSet
    val got = Streams.valueOutliers(Tables(spark, Sf, "events")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSet
    assert(got == want)
    // both sides of the gate at fixture scale
    assert(got.nonEmpty && got.size < ev.length)
    // the moments are order-independent: repartitioning changes nothing
    assert(Streams.valueOutliers(
      Tables(spark, Sf, "events").repartition(7)).collect()
      .map(r => (r.getLong(0), r.getDouble(4), r.getDouble(5))).toSet ==
      got.map(t => (t._1, t._5, t._6)))
  }

  test("boilerplate strip: tags out, known spans out, round-trip audited") {
    val pairs = Seq(
      (1L, "plain words here",
        "<div class=\"nav\"><b>plain</b> words here</div>"),
      (2L, "keep me", "<p>keep me</p><p> Cookie Policy OK</p>"),
      (3L, "mismatch", "<span>mismatch plus extra</span>"),
      (4L, "no markup at all", "no markup at all"))
      .toDF("doc_id", "orig", "html")
    val got = TextOps.boilerplateStripOf(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_tags"), r.getAs[Boolean]("had_boiler"),
        r.getAs[Boolean]("restored"), r.getAs[Long]("n_chars")))).toMap
    assert(got(1L) == ((4L, false, true, "plain words here".length.toLong)))
    assert(got(2L) == ((4L, true, true, "keep me".length.toLong)))
    assert(got(3L) == ((2L, false, false,
      "mismatch plus extra".length.toLong)))
    assert(got(4L) == ((0L, false, true, "no markup at all".length.toLong)))
    // and the fixture entry restores EVERY document
    val entry = TextOps.boilerplateStrip(spark, Sf).collect()
    assert(entry.nonEmpty && entry.forall(_.getAs[Boolean]("restored")))
  }

  test("signal correlation replays the quantized Pearson arithmetic") {
    val stats = TextOps.textStats(spark, Sf).collect()
      .map(r => TextOps.CorrSignals.map { s =>
        val v: Double = r.get(r.fieldIndex(s)) match {
          case l: java.lang.Long => l.toDouble
          case i: java.lang.Integer => i.toDouble
          case d: java.lang.Double => d
          case other => sys.error(s"unexpected $other")
        }
        s -> math.floor(v * 1000000.0).toLong
      }.toMap)
    val expect = (for {
      i <- TextOps.CorrSignals.indices
      j <- (i + 1) until TextOps.CorrSignals.size
    } yield {
      val (a, b) = (TextOps.CorrSignals(i), TextOps.CorrSignals(j))
      val xs = stats.map(_(a)); val ys = stats.map(_(b))
      val n = xs.length.toDouble
      def bsum(s: Seq[BigInt]) = s.sum.toDouble
      val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
      val sxy = bsum(xs.zip(ys).map { case (x, y) => BigInt(x) * y })
      val sxx = bsum(xs.map(x => BigInt(x) * x))
      val syy = bsum(ys.map(y => BigInt(y) * y))
      val cov = n * sxy - sx * sy
      val r2 = (cov * cov) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
      (a, b) -> ((xs.length.toLong, r2,
        if (cov > 0) 1L else if (cov < 0) -1L else 0L))
    }).toMap
    val got = TextOps.signalCorr(spark, Sf).collect()
      .map(r => (r.getAs[String]("sig_a"), r.getAs[String]("sig_b")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("r2"), r.getAs[Long]("sign")))).toMap
    assert(got == expect)
    // the redundancy the audit exists to catch: chars ~ tokens
    assert(got(("n_chars", "n_tokens"))._2 > 0.9)
  }

  test("span corruption replays the md5 coin and run counting") {
    def coin(docId: Long, p: Int): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$docId:$p".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) / 4294967296.0 <
        TextOps.CorruptRate
    }
    val docs = Tables(spark, Sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").length))
    val expect = docs.map { case (id, n) =>
      val masks = (1 to n).map(coin(id, _))
      val spans = masks.zip(false +: masks.init)
        .count { case (m, prev) => m && !prev }
      id -> ((n.toLong, masks.count(identity).toLong, spans.toLong,
        masks.count(identity).toDouble / n.toDouble))
    }.toMap
    val got = TextOps.spanCorrupt(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked"),
        r.getAs[Long]("n_spans"), r.getAs[Double]("mask_frac")))).toMap
    assert(got == expect)
    // the coin is honest: corpus-level mask rate near the 15% target
    val frac = got.values.map(_._2).sum.toDouble /
      got.values.map(_._1).sum.toDouble
    assert(math.abs(frac - TextOps.CorruptRate) < 0.03, frac.toString)
  }

  test("chi2 terms match the in-memory contingency replay") {
    val docs = Tables(spark, Sf, "documents")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getString(1).split(" ").distinct.toSet,
        r.getString(2) == "en"))
    val n = docs.length.toLong
    val nEn = docs.count(_._2).toLong
    val vocab = docs.flatMap(_._1).distinct
    val expect = vocab.map { w =>
      val a = docs.count(d => d._1(w) && d._2).toLong
      val b = docs.count(d => d._1(w) && !d._2).toLong
      val c = nEn - a
      val dd = n - nEn - b
      val adbc = (BigInt(a) * dd - BigInt(b) * c)
      val chi2 = (BigInt(n) * adbc * adbc).toDouble /
        (BigInt(a + b) * (c + dd) * (a + c) * (b + dd)).toDouble
      (w, a, b, chi2)
    }.sortBy { case (w, _, _, chi2) => (-chi2, w) }
      .take(TextOps.Chi2TopK)
      .zipWithIndex.map { case ((w, a, b, chi2), i) =>
        (w, a, b, chi2, (i + 1).toLong) }
    val got = TextOps.chi2Terms(spark, Sf).collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Double]("chi2"), r.getAs[Long]("rk"))).sortBy(_._5).toSeq
    assert(got == expect.toSeq)
  }

  test("concentration: HHI axes replay exactly, effective_n inverts") {
    val docs = Tables(spark, Sf, "documents")
      .select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    def hhi(counts: Seq[Long]): (Long, Long, Double) = {
      val total = counts.sum
      val ss = counts.map(c => BigInt(c) * c).sum
      (counts.length.toLong, total,
        ss.toDouble / (BigInt(total) * total).toDouble)
    }
    val expect = Map(
      "source" -> hhi(docs.groupBy(_._1).values.map(_.size.toLong).toSeq),
      "lang" -> hhi(docs.groupBy(_._2).values.map(_.size.toLong).toSeq),
      "token" -> hhi(docs.flatMap(_._3.split(" ")).groupBy(identity)
        .values.map(_.size.toLong).toSeq))
    val got = TextOps.concentration(spark, Sf).collect()
      .map(r => r.getAs[String]("axis") -> ((r.getAs[Long]("n_groups"), r.getAs[Long]("total"),
        r.getAs[Double]("hhi"), r.getAs[Double]("effective_n")))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (axis, (ng, tot, h)) =>
      val (gn, gt, gh, geff) = got(axis)
      assert((gn, gt, gh) == ((ng, tot, h)), axis)
      assert(geff == 1.0 / h, axis)
    }
  }

  test("voiceActivity equals a sequential per-doc replay of the gate") {
    import graft.operators.Multimodal
    val frames = Multimodal.audioEnergy(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx"), r.getAs[Long]("energy")))
    val got = Multimodal.voiceActivity(spark, Sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seg_id"), r.getAs[Long]("n_frames"), r.getAs[Int]("start_frame"),
        r.getAs[Long]("sum_energy"))).toSet
    val want = frames.groupBy(_._1).flatMap { case (doc, fs) =>
      val active = fs.filter(_._3 >= Multimodal.VadThreshold).sortBy(_._2)
      var prevIdx = Option.empty[Int]
      var seg = 0L
      active.map { case (_, idx, e) =>
        if (!prevIdx.contains(idx - 1)) seg += 1
        prevIdx = Some(idx)
        (doc, seg, idx, e)
      }.groupBy(_._2).map { case (sid, rows) =>
        (doc, sid, rows.length.toLong, rows.map(_._3).min,
          rows.map(_._4).sum)
      }
    }.toSet
    assert(got == want)
    // fixture exercises BOTH sides of the gate: some frames silent,
    // and no silent frame appears inside any emitted segment span count
    assert(frames.exists(_._3 < Multimodal.VadThreshold))
    assert(got.nonEmpty)
  }

  test("retrievalEval self-rank equals the sequential count-above-self") {
    import graft.operators.Multimodal
    val got = Multimodal.retrievalEval(spark, Sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("self_rank"), r.getAs[Boolean]("hit1"), r.getAs[Boolean]("hitk"))).toMap
    assert(got.size == Multimodal.MmEvalQ)
    // sequential replay on the collected modality tables
    val media = Multimodal.queries("llm_mm_decode_features")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue))
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3.toDouble) }
    val emb = Tables(spark, Sf, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding")
          .cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val n = Multimodal.ByteHistogramDecoder.NumFeatures
    def quant(v: Seq[Double]): (Seq[Double], Double) = {
      val s = v.map(math.abs).max
      (v.map(x => if (s == 0) 0.0
        else math.floor(x * 127.0 / s + 0.5)), s)
    }
    def pool(e: Seq[Double]): Seq[Double] =
      (0 until n).map(g =>
        (0 until n).foldLeft(0.0)((a, j) => a + e(g + j * n)))
    val mq = media.map { case (id, v) => id -> quant(v) }
    got.keys.foreach { q =>
      val (qt, st) = quant(pool(emb(q)))
      def score(m: Long): Double = {
        val (qm, sm) = mq(m)
        qt.zip(qm).map { case (a, b) => a * b }.sum * st * sm / 16129.0
      }
      val self = score(q)
      val want = 1L + mq.keys.count(m =>
        score(m) > self || (score(m) == self && m < q))
      assert(got(q) == ((want, want == 1L, want <= Multimodal.MmEvalK)),
        s"query $q")
    }
  }

  test("vocab gini: hand-checked diversity on a two-language corpus") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (0L, "x x y", "a", "s1", 5L),
      (1L, "z", "b", "s1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.TextOps.vocabGiniOf(corpus).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"), r.getAs[Double]("gini"), r.getAs[Double]("simpson_eff"))))
      .toMap
    // lang a: cf = {x:2, y:1}, C=3, sq=5 -> gini 4/9, simpson 9/5
    assert(got("a") == ((3L, 2L, 4.0 / 9.0, 9.0 / 5.0)))
    // lang b: single token -> gini 0, simpson 1
    assert(got("b") == ((1L, 1L, 0.0, 1.0)))
    // overall: cf = {x:2, y:1, z:1}, C=4, sq=6
    assert(got("<all>") == ((4L, 3L, 10.0 / 16.0, 16.0 / 6.0)))
  }

  test("phash MIH candidate volume is key-cardinality bounded; recall total") {
    import graft.operators.Multimodal
    val s = spark; import s.implicits._
    // seeded synthetic hash corpus (the SkewSpec planted pattern):
    // n spread base hashes — splitmix64-mixed, i.e. uniform on the
    // 56-bit space like unrelated images — plus a planted near-dup
    // partner for every 8th doc at an exact distance ≤ HamMax.
    val W = Multimodal.PhashBins
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (z ^ (z >>> 31)) & ((1L << W) - 1)
    }
    def corpus(n: Int): Seq[(Long, Long)] = {
      val base = (0 until n).map(i => (i.toLong, mix(i.toLong)))
      val planted = (0 until n by 8).map { i =>
        val d = 3 + (i / 8) % (Multimodal.PhashHamMax.toInt - 2)
        var h = base(i)._2
        var flipped = 0
        var b = 0
        while (flipped < d && b < W) { // seeded distinct bit choices
          if (((mix(i * 1000L + b) >>> 13) & 3) == 0) {
            h ^= 1L << b; flipped += 1
          }
          b += 1
        }
        ((n + i).toLong, h)
      }
      base ++ planted
    }
    // ε = substrings·|probes|/2^subBits: the uniform-data candidate
    // fraction the MIH layout admits — THE scale number (it shrinks
    // exponentially in substring width, so it falls with hash width;
    // at fixed W = 56 exact-match blocking is Θ(ε·n²), which is why
    // the honest doubling assertion is "the ε bound keeps holding",
    // not literal linear growth).
    val eps = Multimodal.PhashSubstr.toDouble *
      Multimodal.PhashProbeMasks.size / (1L << Multimodal.PhashSubBits)
    for (n <- Seq(192, 384)) {
      val rows = corpus(n)
      val df = rows.toDF("doc_id", "ph")
      val cands = Multimodal.phashCandidatesOf(df).collect()
      // (1) completeness: every brute-force pair within HamMax is a
      // candidate (the planted partners, plus any background hit)
      val truth = (for {
        (a, ha) <- rows; (b, hb) <- rows if a < b
        if java.lang.Long.bitCount(ha ^ hb) <= Multimodal.PhashHamMax
      } yield (a, b)).toSet
      assert(truth.size >= n / 8, "fixture must exercise the radius")
      val got = cands.filter(_.getAs[Long]("hamming") <= Multimodal.PhashHamMax)
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      assert(truth.subsetOf(got), s"missed ${(truth -- got).size} pairs")
      // (2) the prune bound: candidate multiplicity stays within 2×
      // the uniform ε expectation as the corpus doubles — ~38× below
      // all-pairs for this layout
      val all = rows.size.toLong * (rows.size - 1) / 2
      assert(cands.length <= (2.0 * eps * all).toLong + truth.size,
        s"n=$n: ${cands.length} candidates vs ε bound ${(eps * all).toLong}")
      // (3) contrast: the r11 single-4-bit-chunk blocking on the SAME
      // corpus — 16-value keys — admits most of all-pairs; MIH must
      // beat it by well over an order of magnitude
      var old = 0L
      for { (a, ha) <- rows; (b, hb) <- rows if a < b } {
        var c = 0
        var hit = false
        while (c < 14 && !hit) {
          if (((ha >>> (4 * c)) & 15) == ((hb >>> (4 * c)) & 15)) hit = true
          c += 1
        }
        if (hit) old += 1
      }
      assert(old > cands.length * 10L,
        s"n=$n: old-scheme $old vs MIH ${cands.length}")
    }
  }

  test("phash dedup: brute-force Hamming parity at the fixture") {
    import graft.operators.Multimodal
    // compute each doc's hash via the operator's own kernel seam by
    // running the entry, then brute-force ALL pairs from the collected
    // hash values: the chunk pigeonhole must lose nothing at radius
    // <= PhashHamMax
    val got = Multimodal.phashDedup(spark, Sf).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")), r.getAs[Long]("hamming"))).toMap
    // recompute hashes in-memory with the same exact-integer rule
    val docs = graft.Tables(spark, Sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.length >= Multimodal.PhashBins)
    def hash(text: String): Long = {
      val n = text.length.toLong
      val tot = text.map(_.toLong).sum
      (0 until Multimodal.PhashBins).foldLeft(0L) { (h, b) =>
        val lo = b * n / Multimodal.PhashBins
        val hi = (b + 1) * n / Multimodal.PhashBins
        val sb = (lo.toInt until hi.toInt).map(text.charAt(_).toLong).sum
        if (sb * n > tot * (hi - lo)) h | (1L << b) else h
      }
    }
    val hs = docs.map { case (id, t) => (id, hash(t)) }
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= Multimodal.PhashHamMax
    } yield ((a, b), d.toLong)).toMap
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    assert(got.nonEmpty, "radius must be exercised at fixture scale")
  }
}
