package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.TextSources

/** The reference's text formats (FIXTURES.md §1 samples, checked in as
  * resources): basket lines, labeled vector lines, key<TAB>value sink.
  */
class TextSourcesSpec extends SparkSpecBase {

  private def res(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  test("transaction lines parse to baskets; blanks dropped, runs of spaces ok") {
    val tx = TextSources.transactions(spark, res("transactions.txt"))
      .collect().map(_.getSeq[String](0).toList)
    assert(tx.length == 4) // 5 lines, 1 blank
    assert(tx.count(_ == List("bread", "milk", "eggs")) == 2) // incl. "  "
    assert(tx.contains(List("bread", "milk")))
    assert(tx.contains(List("milk", "eggs", "butter")))
  }

  test("wordcount over the basket file matches the reference's job-1 shape") {
    val counts = TextSources.transactions(spark, res("transactions.txt"))
      .select(explode(col("items")).as("item"))
      .groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("bread" -> 3L, "milk" -> 4L, "eggs" -> 3L,
      "butter" -> 1L))
  }

  test("labeled vector lines parse with the bias prepended") {
    val obs = TextSources.labeledVectors(spark, res("labeled.txt"))
      .collect().sortBy(_.id)
    assert(obs.length == 3)
    assert(obs(0).y == 3.1 && obs(0).x.toSeq == Seq(1.0, 1.0, 2.0))
    assert(obs(1).y == 5.0 && obs(1).x.toSeq == Seq(1.0, 2.0, 3.5))
    assert(obs(2).y == -0.5 && obs(2).x.toSeq == Seq(1.0, 0.25, 1.25))
  }

  test("Apriori runs end-to-end on the reference's basket file format") {
    import graft.operators.Apriori
    val tx = TextSources.transactions(spark, res("transactions.txt"))
    // support 2 over: {bread milk eggs}×2, {bread milk}, {milk eggs butter}
    val sets = Apriori.freqItemsetsOf(tx, support = 2)
      .collect().map(r => r.getAs[String]("itemset") -> r.getAs[Long]("cnt")).toMap
    assert(sets == Map(
      "bread milk" -> 3L, "bread eggs" -> 2L, "eggs milk" -> 3L,
      "bread eggs milk" -> 2L))
    val rules = Apriori.assocRulesOf(tx, support = 2)
      .collect()
      .map(r => (r.getAs[String]("antecedent"), r.getAs[String]("consequent")) -> r.getAs[Double]("confidence")).toMap
    // confidence(bread ⇒ milk) = 100·supp(bread milk)/supp(bread) = 100·3/3
    assert(rules(("bread", "milk")) == 100.0)
    // confidence(milk ⇒ bread) = 100·3/4
    assert(rules(("milk", "bread")) == 75.0)
    // confidence(eggs milk ⇒ bread) = 100·2/3
    assert(math.abs(rules(("eggs milk", "bread")) - 200.0 / 3) < 1e-9)
  }

  test("labeled vector parsing drops malformed lines instead of failing") {
    val dir = Files.createTempDirectory("graft_dirty")
    val f = dir.resolve("dirty.txt")
    Files.writeString(f,
      "1.0 2.0 3.0\nnot numeric\n4.0 oops 6.0\n\n7.0 8.0 9.0\n")
    val obs = TextSources.labeledVectors(spark, f.toString)
      .collect().sortBy(_.id)
    assert(obs.length == 2)
    assert(obs.map(_.y).toSeq == Seq(1.0, 7.0))
  }

  test("near-dup dedup runs straight off a raw text file") {
    import graft.operators.Dedup
    val dir = Files.createTempDirectory("graft_docs")
    val f = dir.resolve("docs.txt")
    // two near-identical docs (last token changed), one unrelated
    Files.writeString(f,
      ("alpha beta gamma delta epsilon zeta eta theta iota kappa mu kappa\n"
        + "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu\n"
        + "one two three four five six seven eight nine ten\n"))
    val docs = TextSources.documents(spark, f.toString)
    val pairs = Dedup.minhashLshOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    assert(pairs.length == 1)
    val (a, b, j) = pairs(0)
    assert(Set(a, b) == Set(0L, 1L))
    // 12 tokens → 10 3-gram shingles; only the last differs → J = 9/11
    assert(j == 9.0 / 11.0)
  }

  test("text analysis Of-variants run over a raw text file corpus") {
    import graft.operators.TextOps
    val docs = TextSources.documents(spark, res("transactions.txt"))
    val stats = TextOps.textStatsOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tokens")).toMap
    assert(stats.values.sum == 11) // 3+2+3+3 tokens over 4 non-blank lines
    val wc = TextOps.wordCountOf(docs).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("cnt")).toMap
    assert(wc == Map("bread" -> 3L, "milk" -> 4L, "eggs" -> 3L,
      "butter" -> 1L))
    val fp = TextOps.fingerprintOf(docs).collect()
    assert(fp.length == 4 && fp.map(_.getString(1)).distinct.length == 3,
      "the two identical basket lines must share a content hash")
  }

  test("key-tab-value sink round-trips") {
    val s = spark; import s.implicits._
    val out = Files.createTempDirectory("graft_kv").toString
    TextSources.writeKV(
      Seq(("bread", 3L), ("milk", 4L)).toDF("item", "cnt"),
      out, "item", "cnt")
    val lines = spark.read.text(out).collect().map(_.getString(0)).sorted
    assert(lines.toSeq == Seq("bread\t3", "milk\t4"))
  }

  test("jsonl corpus round-trips and feeds the Of-operators") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-")
    val in = graft.Tables(spark, Sf, "documents")
      .select("doc_id", "lang", "text")
    TextSources.writeJsonl(in, s"$dir/docs")
    val back = TextSources.jsonlDocuments(spark, s"$dir/docs")
    assert(back.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      in.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet)
    // malformed + unparsable lines drop, valid ones survive
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/dirty.jsonl"),
      "not json at all\n{\"doc_id\": 7, \"lang\": \"en\", \"text\": \"ok doc\"}\n{\"lang\": \"en\"}\n"
        .getBytes("UTF-8"))
    val dirty = TextSources.jsonlDocuments(spark, s"$dir/dirty.jsonl")
      .collect()
    assert(dirty.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((7L, "ok doc")))
    // and the corpus shape composes with the operator surface
    assert(graft.operators.TextOps.tokenCountOf(back).count() == in.count())
  }

  test("orc and csv corpora round-trip, including delimiter-hostile text") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt-")
    val s = spark; import s.implicits._
    val in = graft.Tables(spark, Sf, "documents")
        .select("doc_id", "lang", "text")
      .unionByName(Seq(
        // embedded delimiters, quotes, and a newline — the cases a
        // naive CSV writer corrupts; Spark's quoting must carry them
        (900001L, "en", "comma, separated, \"quoted\" text"),
        (900002L, "en", "line one\nline two")).toDF(
        "doc_id", "lang", "text"))
    TextSources.writeOrc(in, s"$dir/orc")
    val backOrc = TextSources.orcDocuments(spark, s"$dir/orc")
    def set(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(set(backOrc) == set(in))
    TextSources.writeCsv(in, s"$dir/csv")
    val backCsv = TextSources.csvDocuments(spark, s"$dir/csv")
    // CSV: the embedded-newline row needs multiLine to round-trip; the
    // default reader drops/garbles it — assert the quoted-comma row
    // survives exactly and the loss is CONFINED to the newline doc
    val csvSet = set(backCsv)
    assert(csvSet.contains(
      (900001L, "en", "comma, separated, \"quoted\" text")))
    assert((set(in) -- csvSet).forall(_._1 == 900002L),
      "csv loss beyond the embedded-newline doc")
  }

  test("writeOnce: one write per path, failure clears, waiter retries") {
    val path = "graft-once-" + System.nanoTime()
    var runs = 0
    TextSources.writeOnce(path) { runs += 1 }
    TextSources.writeOnce(path) { runs += 1 }
    assert(runs == 1, "second call must skip the idempotent write")

    // a FAILED write clears the marker: the next call retries
    val path2 = path + "-fail"
    var attempts = 0
    intercept[RuntimeException] {
      TextSources.writeOnce(path2) { attempts += 1; sys.error("disk full") }
    }
    TextSources.writeOnce(path2) { attempts += 1 }
    assert(attempts == 2, "failure must clear the marker for a retry")
    TextSources.writeOnce(path2) { attempts += 1 }
    assert(attempts == 2, "the successful retry re-arms the skip")

    // a concurrent skipper AWAITS the in-flight write instead of
    // reading a half-written directory (the pre-write-boolean hazard)
    val path3 = path + "-race"
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    @volatile var writerDone = false
    @volatile var skipperSawDone = false
    val writer = new Thread(() => TextSources.writeOnce(path3) {
      started.countDown(); release.await(); writerDone = true
    })
    writer.start()
    started.await()
    val skipper = new Thread(() => {
      TextSources.writeOnce(path3) { fail("skipper must not re-write") }
      skipperSawDone = writerDone
    })
    skipper.start()
    Thread.sleep(100) // give the skipper time to (wrongly) skip through
    assert(skipper.isAlive, "skipper must block until the write completes")
    release.countDown()
    writer.join(5000); skipper.join(5000)
    assert(!writer.isAlive && !skipper.isAlive)
    assert(skipperSawDone, "skipper proceeded before the write finished")
  }
}
