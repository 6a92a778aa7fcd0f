package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column operators (SURVEY.md §2.11): opaque `binary` media
  * columns with typed metadata, nested/JSON property extraction, and the
  * decode / feature-extract / frame-sample plumbing of a media pipeline.
  *
  * The container has no imaging/audio runtime, so the actual byte→pixels
  * decode is STUBBED (see [[MediaDecoder]]): [[ByteHistogramDecoder]] is a
  * clearly-marked deterministic fake. Everything around the stub — the
  * binary column representation, per-partition batched iteration, fixed
  * output schema, partition-parallel plan shape — is real and oracle- or
  * spec-tested. Media bytes are derived from `documents.text` via
  * `encode(_, 'UTF-8')` so the fixtures need no new tables.
  *
  * Scale notes: every query here is embarrassingly parallel (per-row or
  * per-partition narrow ops; the only shuffle is props_agg's groupBy with
  * partial aggregation). A real 100 TB media pipeline keeps bytes out of
  * the shuffle exactly like this: decode early, ship features, never
  * repartition raw media.
  */
object Multimodal {

  /** The decode seam a real deployment fills with an imaging library. */
  trait MediaDecoder extends Serializable {
    /** bytes → 8 strided byte-histogram feature sums (fixed shape). */
    def features(bin: Array[Byte]): Array[Long]
  }

  /** Deterministic fake decoder (STUB — stands in for e.g. a JPEG
    * decode + pooling): byte b at offset i contributes to feature i % 8.
    * Exactly reproducible in SQL, which is what makes the plumbing
    * oracle-checkable without a media runtime.
    */
  object ByteHistogramDecoder extends MediaDecoder {
    val NumFeatures = 8
    def features(bin: Array[Byte]): Array[Long] = {
      val sums = new Array[Long](NumFeatures)
      var i = 0
      while (i < bin.length) {
        sums(i % NumFeatures) += (bin(i) & 0xff).toLong
        i += 1
      }
      sums
    }
  }

  /** Deterministic "resize" STUB (stands in for bilinear image resize):
    * bucket the byte stream into `target` equal spans and average each —
    * the shape (fixed-size output from variable-size media, pure
    * function of the bytes) is what downstream batching relies on.
    */
  def resizeStub(bin: Array[Byte], target: Int): Array[Double] = {
    val out = new Array[Double](target)
    if (bin.isEmpty) return out
    var t = 0
    while (t < target) {
      val lo = (t.toLong * bin.length / target).toInt
      val hi = math.max((((t + 1).toLong * bin.length) / target).toInt, lo + 1)
      var s = 0.0
      var i = lo
      while (i < hi && i < bin.length) { s += (bin(i) & 0xff); i += 1 }
      out(t) = s / (hi - lo)
      t += 1
    }
    out
  }

  /** Placeholder for the real thing; deliberately unimplemented. */
  object RealImageDecoder extends MediaDecoder {
    def features(bin: Array[Byte]): Array[Long] =
      throw new UnsupportedOperationException(
        "real media decode requires an imaging runtime not present in " +
          "this container; use ByteHistogramDecoder for the plumbing path")
  }

  // NOT private: Spark's generated deserializer code must reach it.
  case class DocBin(doc_id: Long, bin: Array[Byte])

  /** Nested-property extraction: `events.props` JSON → typed value,
    * aggregated per event type. The JSON parse is a per-row codegen'd
    * expression; the groupBy has map-side partial aggregation.
    */
  def propsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** Typed metadata over an opaque binary column: size, head bytes (hex),
    * content digest — the catalog row a media lake stores next to the
    * blob. The bytes never leave the scan partition.
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val bin = encode(col("text"), "UTF-8")
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      octet_length(bin).as("n_bytes"),
      hex(encode(substring(col("text"), 1, 4), "UTF-8")).as("head_hex"),
      md5(bin).as("content_md5"))
  }

  /** Decode + feature-extract through the [[MediaDecoder]] seam: binary
    * column → per-partition batched typed iteration → fixed-shape feature
    * rows (doc_id, grp, byte_sum). `mapPartitions` is the deliberate
    * choice: a real decoder amortizes native-lib init per partition, not
    * per row — the same batch shape `mapInPandas` gives Python pipelines.
    */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val s = spark; import s.implicits._
    val decoder: MediaDecoder = ByteHistogramDecoder
    Tables(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
      .as[DocBin]
      .mapPartitions { it =>
        it.flatMap { d =>
          val f = decoder.features(d.bin)
          f.indices.iterator.map(g => (d.doc_id, g, f(g)))
        }
      }
      .toDF("doc_id", "grp", "byte_sum")
  }

  /** Feature-quantization step for [[featureDup]]: byte-sum buckets of
    * this width collapse near-identical media into the same fingerprint
    * (the coarseness knob every perceptual hash has).
    */
  val FeatureQuant = 256L

  /** Perceptual-style duplicate detection in DECODED-FEATURE space: two
    * media objects whose QUANTIZED [[MediaDecoder]] features agree are
    * flagged as a duplicate pair even when their bytes differ — the
    * composition a multimodal pipeline runs (decode → quantize →
    * fingerprint → bucket-join), here over the [[ByteHistogramDecoder]]
    * stub seam. The fingerprint is md5 of the ordered quantized vector,
    * so candidates meet through an equi-join on a fixed-width key
    * (exact-dedup's scale shape — never an all-pairs product); pairs
    * emit as doc_a < doc_b.
    */
  def featureDup(spark: SparkSession, dir: String): DataFrame = {
    val keys = decodeFeatures(spark, dir)
      .select(col("doc_id"), col("grp"),
        expr(s"byte_sum div $FeatureQuant").as("fq"))
      .groupBy("doc_id")
      .agg(md5(concat_ws("_",
        transform(sort_array(collect_list(struct(col("grp"),
          col("fq")))), s => s.getField("fq").cast("string"))))
        .as("fkey"))
    val a = keys.select(col("doc_id").as("doc_a"), col("fkey"))
    val b = keys.select(col("doc_id").as("doc_b"), col("fkey"))
    a.join(b, "fkey").where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("fkey"))
  }

  /** Frame sampling: every 32nd byte of the media column as a (frame_idx,
    * sample) row — the stride-subsample shape of video keyframe
    * extraction, as a narrow generator (sequence + posexplode), no UDF.
    */
  val FrameStride = 32

  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), floor((length(col("text")) - 1) / FrameStride)
            .cast("int")),
          f => ascii(substring(col("text"), f * FrameStride + 1, lit(1))))))
      .select(col("doc_id"), col("pos").as("frame_idx"),
        col("col").cast("long").as("sample_byte"))

  /** Overlapping-frame energy: 64-byte frames every 32 bytes (each byte
    * in ≤ 2 frames), per-frame sum of squared byte values — the
    * hop/window shape of audio feature extraction (RMS energy, STFT
    * framing), as narrow generators + exact integer arithmetic.
    */
  val FrameLen = 64
  val FrameHop = 32

  def audioEnergy(spark: SparkSession, dir: String): DataFrame = {
    val s = spark; import s.implicits._
    // typed kernel: the column-expression form nests two higher-order
    // functions (interpreted per char — measured ~4 s at sf0.1 vs ~0.3 s
    // here); byte values are ASCII codepoints, identical to the oracle's
    // ord(substr(...)).
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val n = text.length
        val frames = (n - 1) / FrameHop + 1
        (0 until frames).iterator.map { f =>
          val lo = f * FrameHop
          val hi = math.min(lo + FrameLen, n)
          var e = 0L
          var i = lo
          while (i < hi) {
            val c = text.charAt(i).toLong
            e += c * c
            i += 1
          }
          (id, f, e)
        }
      }
      .toDF("doc_id", "frame_idx", "energy")
  }

  /** Scene-change segmentation over the [[audioEnergy]] frame stream —
    * the keyframe-selection primitive of a video ingestion pipeline: a
    * frame opens a new scene when its energy jumps more than 25% from
    * the previous frame (spelled `|Δe|·4 > prev` so the test is exact
    * integer arithmetic, no division), and each scene rolls up to one
    * (doc, scene) row with its frame count, start frame, and total
    * energy. Downstream, one keyframe per scene is what gets decoded /
    * embedded instead of every frame — this table is the pruning plan.
    *
    * Shape: one lag + one running sum, both windows PARTITIONED by
    * doc_id (parallel, bounded by frames-per-media), then a group-by on
    * the same key — the partitioning is reused across all three.
    */
  def sceneCuts(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    audioEnergy(spark, dir)
      .withColumn("prev_e", lag(col("energy"), 1).over(w))
      .withColumn("cut", when(col("prev_e").isNull
          || abs(col("energy") - col("prev_e")) * 4 > col("prev_e"), 1L)
        .otherwise(0L))
      .withColumn("scene_id", sum(col("cut")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "scene_id")
      .agg(count(lit(1)).as("n_frames"),
        min(col("frame_idx")).as("start_frame"),
        sum(col("energy")).as("sum_energy"))
  }

  /** Active-frame energy cut for [[voiceActivity]] — sits between the
    * fixture's full-frame energies (median ≈ 620k: 64 letter bytes at
    * ~100² each) and its trailing partial frames, so ~12% of frames
    * read as silence and the segmenter exercises both sides.
    */
  val VadThreshold = 400000L

  /** Voice-activity segmentation over the [[audioEnergy]] frame stream
    * — the silence-removal pass an audio ingestion pipeline runs before
    * transcription/embedding (energy-gate VAD, the classic baseline):
    * frames at or above [[VadThreshold]] are speech, maximal runs of
    * consecutive active frames roll up to one segment row, silent
    * frames appear nowhere. Complements [[sceneCuts]] (jump-based
    * boundaries over ALL frames) with threshold-gated islands — the
    * other standard segmentation primitive.
    *
    * Shape: the frame stream filters row-local, then one lag (gap test
    * on frame indices) + one running sum + one rollup, all three
    * PARTITIONED by doc_id and reusing a single partitioning — bounded
    * by frames-per-media, never corpus-wide.
    * (doc_id, seg_id, n_frames, start_frame, sum_energy).
    */
  def voiceActivity(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    audioEnergy(spark, dir)
      .where(col("energy") >= VadThreshold)
      .withColumn("prev_idx", lag(col("frame_idx"), 1).over(w))
      .withColumn("newseg", when(col("prev_idx").isNull
          || col("prev_idx") =!= col("frame_idx") - 1, 1L).otherwise(0L))
      .withColumn("seg_id", sum(col("newseg")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "seg_id")
      .agg(count(lit(1)).as("n_frames"),
        min(col("frame_idx")).as("start_frame"),
        sum(col("energy")).as("sum_energy"))
  }

  /** Fixed-size resample width for [[resizeFeatures]]. */
  val ResizeTarget = 8

  /** Fixed-size representation per document through the [[resizeStub]]
    * seam — the batching contract of media pipelines (variable-size
    * blobs in, constant-width tensors out), exploded to one row per
    * output cell so the oracle can hash-compare it. Span sums are
    * integer-exact in doubles (bytes < 2⁵³), so the per-cell mean is
    * bit-equal to the oracle's BIGINT-sum-then-divide.
    */
  def resizeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val s = spark; import s.implicits._
    Tables(spark, dir, "documents")
      .where(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bin"))
      .as[DocBin]
      .flatMap { d =>
        resizeStub(d.bin, ResizeTarget).iterator.zipWithIndex.map {
          case (v, t) => (d.doc_id, t, v)
        }
      }
      .toDF("doc_id", "px", "v")
  }

  /** Caption-alignment threshold: `aligned` = positive quantized-dot
    * margin between the two modality vectors.
    */
  val CaptionThreshold = 0.0

  /** Text↔media alignment scoring — the caption-filter gate (the
    * CLIP-score role) of a multimodal curation pipeline: each document's
    * TEXT embedding is pooled into the [[ByteHistogramDecoder]]'s 8-dim
    * feature space (dim d contributes to group d mod 8 — the same
    * folding rule the decoder applies to bytes), both modality vectors
    * are int8-quantized with [[Similarity]]'s symmetric rule, and the
    * pair is scored by the EXACT integer dot product rescaled by the two
    * scales through the codegen'd [[graft.functions.DotProduct]] — the
    * `llm_sim_int8_topk` serving arithmetic, reused 1:1 per pair.
    * `aligned` = score > [[CaptionThreshold]]: the keep/drop decision a
    * caption filter makes per (text, media) pair.
    *
    * Every step is exact or pinned-order (integer feature sums, exact
    * quantization arithmetic, ≤ 8-term integer dot, one fixed-order IEEE
    * rescale), so the oracle replays the whole two-modality pipeline and
    * hash-matches every score.
    *
    * Scale shape: media features come from the decode seam
    * (partition-parallel, bytes never shuffle); pooling/quantization are
    * row-local projections; the only shuffles are the 8-row-per-doc
    * feature regroup and one key-unique equi-join of the two modality
    * tables.
    */
  def captionScore(spark: SparkSession, dir: String): DataFrame =
    captionScoreOf(spark,
      decodeFeatures(spark, dir),
      Tables(spark, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("embedding")))

  /** `mediaFeatures` = (doc_id, grp, byte_sum) rows (the
    * [[decodeFeatures]] shape); `emb` = (doc_id, embedding).
    */
  def captionScoreOf(spark: SparkSession, mediaFeatures: DataFrame,
      emb: DataFrame): DataFrame = {
    val n = ByteHistogramDecoder.NumFeatures
    // media modality: the 8 decoder features as an ordered double array
    val m = mediaFeatures
      .groupBy("doc_id")
      .agg(transform(
        sort_array(collect_list(struct(col("grp"), col("byte_sum")))),
        s => s.getField("byte_sum").cast("double")).as("mv"))
    // text modality: embedding folded into the same 8-dim space,
    // summed j-ascending with a 0.0 seed (the oracle prepends 0.0)
    val e = col("embedding").cast("array<double>")
    val pooled = transform(sequence(lit(0), lit(n - 1)), g =>
      aggregate(sequence(lit(0), lit(n - 1)), lit(0.0),
        (acc, j) => acc + element_at(e, g + j * lit(n) + lit(1))))
    val t = emb.select(col("doc_id"), pooled.as("tv"))
    val st = Similarity.qScaleOf(col("tv"))
    val sm = Similarity.qScaleOf(col("mv"))
    val joined = t.join(m, "doc_id")
      .select(col("doc_id"), st.as("st"), sm.as("sm"),
        transform(col("tv"), x =>
          Similarity.qElemOf(x, st).cast("double")).as("qt"),
        transform(col("mv"), x =>
          Similarity.qElemOf(x, sm).cast("double")).as("qm"))
    val score = graft.functions.DotProduct.dot(
      spark, col("qt"), col("qm")) * col("st") * col("sm") / 16129.0
    joined.select(col("doc_id"), score.as("cap_score"),
      (score > CaptionThreshold).as("aligned"))
  }

  /** Retrieval-eval query-set size and the hit@k depth. */
  val MmEvalQ = 25L
  val MmEvalK = 5L

  /** Cross-modal retrieval evaluation — the CLIP-style text→media
    * recall check a multimodal curation loop reads before trusting
    * [[captionScore]]'s alignment gate: for each of the first
    * [[MmEvalQ]] documents, its pooled+quantized TEXT vector retrieves
    * over ALL media vectors with the same int8 serving arithmetic, and
    * the row reports where the document's OWN media landed (self_rank,
    * hit@1, hit@[[MmEvalK]]). Identity is ground truth — the standard
    * retrieval-eval protocol when text/media pairs come aligned.
    *
    * Scale shape: NO ranking window exists — a per-query rank over all
    * media would serialize the corpus through one task per query (the
    * WindowBoundSpec class), and only the SELF rank is wanted, so it is
    * computed as a COUNT: self_rank = 1 + #media scoring strictly above
    * the query's own pair (ties to the smaller media id). The bounded
    * query set and the 25-row self-score table broadcast; the media
    * table materializes once and is scanned once corpus-parallel with a
    * map-side-combined aggregate. (doc_id, self_rank, hit1, hitk).
    */
  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    val n = ByteHistogramDecoder.NumFeatures
    val mv0 = decodeFeatures(spark, dir).groupBy("doc_id")
      .agg(transform(
        sort_array(collect_list(struct(col("grp"), col("byte_sum")))),
        s => s.getField("byte_sum").cast("double")).as("mv"))
    val sm = Similarity.qScaleOf(col("mv"))
    val m = graft.Materialize.Local(
      mv0.select(col("doc_id").as("media_id"), sm.as("sm"),
        transform(col("mv"), x =>
          Similarity.qElemOf(x, sm).cast("double")).as("qm")))
    val e = col("embedding").cast("array<double>")
    val pooled = transform(sequence(lit(0), lit(n - 1)), g =>
      aggregate(sequence(lit(0), lit(n - 1)), lit(0.0),
        (acc, j) => acc + element_at(e, g + j * lit(n) + lit(1))))
    val st = Similarity.qScaleOf(col("tv"))
    val t = Tables(spark, dir, "embeddings")
      .where(col("vec_id") < MmEvalQ)
      .select(col("vec_id").as("query_id"), pooled.as("tv"))
      .select(col("query_id"), st.as("st"),
        transform(col("tv"), x =>
          Similarity.qElemOf(x, st).cast("double")).as("qt"))
    def score = graft.functions.DotProduct.dot(
      spark, col("qt"), col("qm")) * col("st") * col("sm") / 16129.0
    val selfS = m.where(col("media_id") < MmEvalQ)
      .join(broadcast(t), col("query_id") === col("media_id"))
      .select(col("query_id"), score.as("self_score"))
    val out = m.crossJoin(broadcast(t))
      .select(col("query_id"), col("media_id"), score.as("score"))
      .join(broadcast(selfS), "query_id")
      .groupBy("query_id")
      .agg((sum(when(col("score") > col("self_score")
          || (col("score") === col("self_score")
            && col("media_id") < col("query_id")), 1L)
        .otherwise(0L)) + 1L).as("self_rank"))
      .select(col("query_id").as("doc_id"), col("self_rank"),
        (col("self_rank") === 1).as("hit1"),
        (col("self_rank") <= MmEvalK).as("hitk"))
      .localCheckpoint()
    graft.Materialize.release(m)
    out
  }

  /** Perceptual-hash raster width (bits). 56, not 64, so the hash and
    * its chunks reuse the sign-bit-free simhash spelling both engines
    * already agree on.
    */
  val PhashBins = 56

  /** Pairs within this Hamming radius are near-duplicates. 10, not the
    * r11 value 13: the fixture's pairwise-distance histogram puts the
    * random-text BACKGROUND at a smooth tail starting ≈ 8 with its
    * mode at 28 (= W/2, i.e. unrelated docs look uniform), so radius
    * 13 sat INSIDE the noise floor — and a 13-of-56 (23%) relative
    * radius is also where no complete exact-match blocking can prune:
    * the pigeonhole forces ≥ 14 index blocks of ≤ 4 bits, whose
    * 16-value keys collide on ~87% of unrelated pairs (measured ≈
    * all-pairs on the fixture — the r11 scale defect). Radius 10 keeps
    * the entry non-vacuous at every fixture scale (5 / 6 / 775 pairs
    * at sf0.001/0.01/0.1) and admits the 14-bit substring index below;
    * CorpusOpsSpec's brute-force parity test is the recall audit — the
    * blocked join returns EXACTLY the all-pairs radius-10 truth.
    */
  val PhashHamMax = 10L

  /** Multi-index hashing layout (Norouzi, Punjani & Fleet, CVPR '12 —
    * the real MIH recipe, with sub-radius probing rather than the
    * degenerate 1-bit-budget chunk split): [[PhashSubstr]] substrings
    * of [[PhashSubBits]] bits each; a radius-[[PhashHamMax]] pair must
    * have SOME substring within Hamming [[PhashSubRadius]] (if all 4
    * were ≥ 3 apart the total would be ≥ 12 > 10), so the probe side
    * enumerates every key within sub-radius of its own — the
    * [[PhashProbeMasks]] XOR set — and candidates come from an
    * EQUI-join on (substring, key).
    *
    * Why this survives scale where the r11 4-bit chunk split did not:
    * candidate volume for exact-match blocking is ε·n²/2 with
    * ε = substrings · |probe set| / 2^subBits. Here ε = 4·106/2¹⁴ ≈
    * 2.6% (measured 20× prune on the correlated fixture hashes, vs ~1×
    * for 16-value chunk keys), and ε shrinks EXPONENTIALLY in the
    * substring width — a production 256-bit hash at the same m = 4
    * gets 64-bit substrings and ε ≈ 10⁻¹⁵, so the key cardinality
    * grows with the hash width and the prune scales with it. The probe
    * fan-out (4 + 4·106 rows of (id, long, key) per document) is the
    * flat price; it does not grow with n.
    */
  val PhashSubstr = 4
  val PhashSubBits = 14

  /** floor(HamMax / Substr) = 2; completeness needs
    * Substr · (SubRadius + 1) > HamMax (4·3 = 12 > 10 ✓).
    */
  val PhashSubRadius: Int = (PhashHamMax / PhashSubstr).toInt

  /** All XOR masks within Hamming [[PhashSubRadius]] of zero on
    * [[PhashSubBits]] bits — C(14,0)+C(14,1)+C(14,2) = 106 probes.
    */
  val PhashProbeMasks: Seq[Long] = {
    def gen(r: Int, from: Int): Seq[Long] =
      if (r == 0) Seq(0L)
      else gen(r - 1, from) ++ (from until PhashSubBits).flatMap(b =>
        gen(r - 1, b + 1).map(_ | (1L << b)))
    gen(PhashSubRadius, 0).distinct.sorted
  }

  /** Row-local aHash kernel over any (doc_id, text) corpus — media
    * bytes never shuffle; the downstream join ships one long per doc.
    */
  def phashHashesOf(corpus: DataFrame): DataFrame = {
    val s = corpus.sparkSession; import s.implicits._
    corpus
      .select(col("doc_id"), col("text"))
      .where(length(col("text")) >= PhashBins)
      .as[(Long, String)]
      .map { case (id, text) =>
        val n = text.length.toLong
        var tot = 0L
        var i = 0
        while (i < text.length) { tot += text.charAt(i).toLong; i += 1 }
        var h = 0L
        var b = 0
        while (b < PhashBins) {
          val lo = b * n / PhashBins
          val hi = (b + 1) * n / PhashBins
          var sb = 0L
          var j = lo.toInt
          while (j < hi) { sb += text.charAt(j).toLong; j += 1 }
          if (sb * n > tot * (hi - lo)) h |= 1L << b
          b += 1
        }
        (id, h)
      }
      .toDF("doc_id", "ph")
  }

  /** MIH candidate pairs of a (doc_id, ph) table, BEFORE the exact
    * Hamming verify — the seam the candidate-volume spec measures.
    * Probe side (each doc × 4 substrings × 106 masks) equi-joins the
    * exact-key index side on (substring position, key); `doc_a <
    * doc_b` halves the symmetric hits. May contain duplicates (a pair
    * can match under several positions/masks) — the caller dedups.
    */
  def phashCandidatesOf(hashes: DataFrame): DataFrame = {
    val subKey = (i: Int) => shiftright(col("ph"), PhashSubBits * i)
      .bitwiseAND(lit((1L << PhashSubBits) - 1L))
    val idx = hashes.select(col("doc_id"), col("ph"),
      posexplode(array((0 until PhashSubstr).map(subKey): _*)))
      .select(col("doc_id"), col("ph"), col("pos"), col("col").as("k"))
    val probe = idx.select(col("doc_id"), col("ph"), col("pos"),
      explode(transform(typedLit(PhashProbeMasks),
        m => col("k").bitwiseXOR(m))).as("k"))
    probe.as("x").join(idx.as("y"),
        col("x.pos") === col("y.pos") && col("x.k") === col("y.k")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.ph").bitwiseXOR(col("y.ph"))).cast("long")
          .as("hamming"))
  }

  /** Perceptual-hash (aHash) near-duplicate pairs — the image-dedup
    * pass of a media pipeline, run here on the stubbed byte stream:
    * resize the media bytes to [[PhashBins]] spans (the [[resizeStub]]
    * span arithmetic), set bit b when span b is brighter than the
    * GLOBAL mean — the comparison spelled s_b·n > S·w_b so it is
    * EXACT integer arithmetic, no float mean — then report pairs
    * within Hamming ≤ [[PhashHamMax]] via the MIH probe equi-join
    * with an exact `bit_count` verify. Unlike [[featureDup]]'s
    * exact-key match this is TOLERANT: a few changed bytes flip a few
    * bits, not the whole key.
    */
  def phashDedup(spark: SparkSession, dir: String): DataFrame =
    phashCandidatesOf(phashHashesOf(
        Tables(spark, dir, "documents").select("doc_id", "text")))
      .where(col("hamming") <= PhashHamMax)
      .distinct()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_mm_phash_dedup" -> phashDedup,
    "llm_mm_caption_score" -> captionScore,
    "llm_mm_retrieval_eval" -> retrievalEval,
    "llm_mm_resize" -> resizeFeatures,
    "llm_mm_props_agg" -> propsAgg,
    "llm_mm_binary_meta" -> binaryMeta,
    "llm_mm_decode_features" -> decodeFeatures,
    "llm_mm_feature_dup" -> featureDup,
    "llm_mm_frame_sample" -> frameSample,
    "llm_mm_audio_energy" -> audioEnergy,
    "llm_mm_scene_cuts" -> sceneCuts,
    "llm_mm_vad" -> voiceActivity
  )

  /** The two-modality pipeline replayed: decoder features (the
    * `llm_mm_decode_features` zero-padded shape) as an ordered list,
    * the embedding folded mod-8 (0.0-prepended left fold = the Spark
    * side's 0.0-seeded aggregate), the int8 quantization rule, and the
    * `llm_sim_int8_topk` rescale order.
    */
  private lazy val captionScoreOracleSql: String = {
    val n = ByteHistogramDecoder.NumFeatures
    val dotSql =
      s"""list_reduce(list_transform(range(1, ${n + 1}),
         |    i -> qt[i] * qm[i]), (x, y) -> x + y)::DOUBLE
         |    * st * sm / 16129.0""".stripMargin
    s"""WITH f0 AS (
       |  SELECT doc_id, (i - 1) % $n AS grp,
       |    sum(ord(substr(text, i::INT, 1)))::BIGINT AS byte_sum
       |  FROM documents,
       |    (SELECT unnest(range(1, 2001)) AS i) ii
       |  WHERE i <= len(text)
       |  GROUP BY doc_id, (i - 1) % $n),
       |mf AS (
       |  SELECT d.doc_id,
       |    list(coalesce(f0.byte_sum, 0)::DOUBLE ORDER BY g.grp) AS mv
       |  FROM (SELECT doc_id FROM documents) d
       |  CROSS JOIN (SELECT unnest(range(0, $n)) AS grp) g
       |  LEFT JOIN f0 ON f0.doc_id = d.doc_id AND f0.grp = g.grp
       |  GROUP BY d.doc_id),
       |tf AS (
       |  SELECT vec_id AS doc_id,
       |    list_transform(range(0, $n), g ->
       |      list_reduce(
       |        list_prepend(0.0::DOUBLE,
       |          list_transform(range(0, $n),
       |            j -> embedding[g + j * $n + 1]::DOUBLE)),
       |        (a, b) -> a + b)) AS tv
       |  FROM embeddings),
       |j AS (
       |  SELECT tf.doc_id, tv, mv,
       |    list_max(list_transform(tv, x -> abs(x))) AS st,
       |    list_max(list_transform(mv, x -> abs(x))) AS sm
       |  FROM tf JOIN mf ON tf.doc_id = mf.doc_id),
       |q AS (
       |  SELECT doc_id, st, sm,
       |    list_transform(tv, x -> CASE WHEN st = 0 THEN 0::BIGINT
       |      ELSE floor(x * 127.0 / st + 0.5)::BIGINT END) AS qt,
       |    list_transform(mv, x -> CASE WHEN sm = 0 THEN 0::BIGINT
       |      ELSE floor(x * 127.0 / sm + 0.5)::BIGINT END) AS qm
       |  FROM j)
       |SELECT doc_id,
       |  $dotSql AS cap_score,
       |  $dotSql > $CaptionThreshold AS aligned
       |FROM q""".stripMargin
  }

  /** Same two-modality CTE chain as [[captionScoreOracleSql]], scored
    * CROSS (bounded query set × all media) with the self-rank count.
    */
  private lazy val retrievalEvalOracleSql: String = {
    val n = ByteHistogramDecoder.NumFeatures
    val dotSql =
      s"""list_reduce(list_transform(range(1, ${n + 1}),
         |    i -> qt[i] * qm[i]), (x, y) -> x + y)::DOUBLE
         |    * st * sm / 16129.0""".stripMargin
    s"""WITH f0 AS (
       |  SELECT doc_id, (i - 1) % $n AS grp,
       |    sum(ord(substr(text, i::INT, 1)))::BIGINT AS byte_sum
       |  FROM documents,
       |    (SELECT unnest(range(1, 2001)) AS i) ii
       |  WHERE i <= len(text)
       |  GROUP BY doc_id, (i - 1) % $n),
       |mf AS (
       |  SELECT d.doc_id AS media_id,
       |    list(coalesce(f0.byte_sum, 0)::DOUBLE ORDER BY g.grp) AS mv
       |  FROM (SELECT doc_id FROM documents) d
       |  CROSS JOIN (SELECT unnest(range(0, $n)) AS grp) g
       |  LEFT JOIN f0 ON f0.doc_id = d.doc_id AND f0.grp = g.grp
       |  GROUP BY d.doc_id),
       |mq AS (
       |  SELECT media_id, mv,
       |    list_max(list_transform(mv, x -> abs(x))) AS sm
       |  FROM mf),
       |m AS (
       |  SELECT media_id, sm,
       |    list_transform(mv, x -> CASE WHEN sm = 0 THEN 0::BIGINT
       |      ELSE floor(x * 127.0 / sm + 0.5)::BIGINT END) AS qm
       |  FROM mq),
       |tf AS (
       |  SELECT vec_id AS query_id,
       |    list_transform(range(0, $n), g ->
       |      list_reduce(
       |        list_prepend(0.0::DOUBLE,
       |          list_transform(range(0, $n),
       |            j -> embedding[g + j * $n + 1]::DOUBLE)),
       |        (a, b) -> a + b)) AS tv
       |  FROM embeddings WHERE vec_id < $MmEvalQ),
       |tq AS (
       |  SELECT query_id, tv,
       |    list_max(list_transform(tv, x -> abs(x))) AS st
       |  FROM tf),
       |t AS (
       |  SELECT query_id, st,
       |    list_transform(tv, x -> CASE WHEN st = 0 THEN 0::BIGINT
       |      ELSE floor(x * 127.0 / st + 0.5)::BIGINT END) AS qt
       |  FROM tq),
       |sc AS (
       |  SELECT t.query_id, m.media_id, $dotSql AS score
       |  FROM t, m),
       |sf AS (SELECT query_id, score AS self_score FROM sc
       |       WHERE query_id = media_id),
       |agg AS (
       |  SELECT sc.query_id AS doc_id,
       |    (sum(CASE WHEN sc.score > sf.self_score
       |        OR (sc.score = sf.self_score
       |          AND sc.media_id < sc.query_id)
       |      THEN 1 ELSE 0 END) + 1)::BIGINT AS self_rank
       |  FROM sc JOIN sf ON sf.query_id = sc.query_id
       |  GROUP BY sc.query_id)
       |SELECT doc_id, self_rank, self_rank = 1 AS hit1,
       |  self_rank <= $MmEvalK AS hitk
       |FROM agg""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "llm_mm_phash_dedup" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, len(text)::BIGINT AS n FROM documents
         |  WHERE len(text) >= $PhashBins),
         |sv AS (
         |  SELECT doc_id, bb.b, n,
         |    ((bb.b + 1) * n) // $PhashBins - (bb.b * n) // $PhashBins
         |      AS w,
         |    list_sum(list_transform(
         |      range((bb.b * n) // $PhashBins + 1,
         |            ((bb.b + 1) * n) // $PhashBins + 1),
         |      i -> ord(substr(text, i::INT, 1))))::BIGINT AS sb
         |  FROM d, (SELECT unnest(range(0, $PhashBins)) AS b) bb),
         |st AS (SELECT doc_id, sum(sb)::BIGINT AS s FROM sv
         |       GROUP BY 1),
         |ph AS (
         |  SELECT sv.doc_id,
         |    sum(CASE WHEN sb * n > s * w THEN (1::BIGINT << sv.b)
         |      ELSE 0 END)::BIGINT AS ph
         |  FROM sv JOIN st ON st.doc_id = sv.doc_id
         |  GROUP BY 1),
         |ck AS (
         |  SELECT doc_id, ph, cc.c AS pos,
         |    (ph >> ($PhashSubBits * cc.c)) & ${(1L << PhashSubBits) - 1}
         |    AS k
         |  FROM ph, (SELECT unnest(range(0, $PhashSubstr)) AS c) cc),
         |pr AS (
         |  SELECT doc_id, ph, pos, xor(k, mm.m) AS k
         |  FROM ck, (SELECT unnest([${PhashProbeMasks.mkString(", ")}])
         |            AS m) mm)
         |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |  bit_count(xor(x.ph, y.ph))::BIGINT AS hamming
         |FROM pr x JOIN ck y
         |  ON x.pos = y.pos AND x.k = y.k AND x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.ph, y.ph)) <= $PhashHamMax""".stripMargin,
    "llm_mm_caption_score" -> captionScoreOracleSql,
    "llm_mm_retrieval_eval" -> retrievalEvalOracleSql,
    "llm_mm_props_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
        |  min(json_extract_string(props, '$.k')::BIGINT) AS min_k,
        |  max(json_extract_string(props, '$.k')::BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "llm_mm_binary_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  hex(encode(substr(text, 1, 4))) AS head_hex,
        |  md5(text) AS content_md5
        |FROM documents""".stripMargin,
    // the decoder zero-fills all 8 groups even for docs shorter than 8
    // bytes, so the oracle pads missing groups with 0 instead of
    // dropping them (a char-indexed GROUP BY alone would emit < 8 rows)
    "llm_mm_decode_features" ->
      """WITH f0 AS (
        |  SELECT doc_id, (i - 1) % 8 AS grp,
        |    sum(ord(substr(text, i::INT, 1)))::BIGINT AS byte_sum
        |  FROM documents,
        |    (SELECT unnest(range(1, 2001)) AS i) ii
        |  WHERE i <= len(text)
        |  GROUP BY doc_id, (i - 1) % 8)
        |SELECT d.doc_id, g.grp, coalesce(f0.byte_sum, 0)::BIGINT
        |  AS byte_sum
        |FROM (SELECT doc_id FROM documents) d
        |CROSS JOIN (SELECT unnest(range(0, 8)) AS grp) g
        |LEFT JOIN f0 ON f0.doc_id = d.doc_id AND f0.grp = g.grp"""
        .stripMargin,
    "llm_mm_feature_dup" ->
      s"""WITH f0 AS (
        |  SELECT doc_id, (i - 1) % 8 AS grp,
        |    (sum(ord(substr(text, i::INT, 1))) // $FeatureQuant)::BIGINT
        |      AS fq
        |  FROM documents,
        |    (SELECT unnest(range(1, 2001)) AS i) ii
        |  WHERE i <= len(text)
        |  GROUP BY doc_id, (i - 1) % 8),
        |f AS (
        |  SELECT d.doc_id, g.grp, coalesce(f0.fq, 0)::BIGINT AS fq
        |  FROM (SELECT doc_id FROM documents) d
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS grp) g
        |  LEFT JOIN f0 ON f0.doc_id = d.doc_id AND f0.grp = g.grp),
        |k AS (
        |  SELECT doc_id,
        |    md5(string_agg(fq::VARCHAR, '_' ORDER BY grp)) AS fkey
        |  FROM f GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fkey
        |FROM k a JOIN k b ON a.fkey = b.fkey AND a.doc_id < b.doc_id"""
        .stripMargin,
    // same span arithmetic as resizeStub, chars == bytes on the ASCII
    // fixture (the decode oracle already pins that assumption)
    "llm_mm_resize" ->
      s"""SELECT doc_id, t AS px,
         |  list_sum(list_transform(range(lo + 1, hi + 1),
         |    i -> ord(substr(text, i::INT, 1))))::DOUBLE
         |    / (hi - lo)::DOUBLE AS v
         |FROM (
         |  SELECT doc_id, text, t,
         |    (t * len(text)) // $ResizeTarget AS lo,
         |    greatest(((t + 1) * len(text)) // $ResizeTarget,
         |             (t * len(text)) // $ResizeTarget + 1) AS hi
         |  FROM documents, (SELECT unnest(range(0, $ResizeTarget)) AS t) tt
         |  WHERE len(text) > 0)""".stripMargin,
    "llm_mm_frame_sample" ->
      s"""SELECT doc_id, f AS frame_idx,
         |  ord(substr(text, (f * $FrameStride + 1)::INT, 1))::BIGINT
         |    AS sample_byte
         |FROM documents,
         |  (SELECT unnest(range(0, 40)) AS f) ff
         |WHERE f * $FrameStride < len(text)""".stripMargin,
    "llm_mm_audio_energy" -> audioEnergyOracleSql,
    // the frame stream replayed, then the exact-integer 25% jump test
    // and the per-doc scene numbering/rollup
    "llm_mm_scene_cuts" ->
      s"""WITH fr AS ($audioEnergyOracleSql),
         |lg AS (
         |  SELECT doc_id, frame_idx, energy,
         |    lag(energy) OVER (PARTITION BY doc_id ORDER BY frame_idx)
         |      AS prev_e
         |  FROM fr),
         |ct AS (
         |  SELECT *, CASE WHEN prev_e IS NULL
         |      OR abs(energy - prev_e) * 4 > prev_e
         |    THEN 1 ELSE 0 END AS cut
         |  FROM lg),
         |sg AS (
         |  SELECT doc_id, frame_idx, energy,
         |    sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
         |      ROWS UNBOUNDED PRECEDING)::BIGINT AS scene_id
         |  FROM ct)
         |SELECT doc_id, scene_id, count(*)::BIGINT AS n_frames,
         |  min(frame_idx) AS start_frame,
         |  sum(energy)::BIGINT AS sum_energy
         |FROM sg GROUP BY doc_id, scene_id""".stripMargin,
    // the frame stream replayed, active-gated, then gaps-and-islands
    // segment numbering on the frame indices and the per-segment rollup
    "llm_mm_vad" ->
      s"""WITH fr AS ($audioEnergyOracleSql),
         |ac AS (SELECT * FROM fr WHERE energy >= $VadThreshold),
         |lg AS (
         |  SELECT *, lag(frame_idx) OVER (PARTITION BY doc_id
         |    ORDER BY frame_idx) AS prev_idx
         |  FROM ac),
         |ns AS (
         |  SELECT *, CASE WHEN prev_idx IS NULL
         |      OR prev_idx != frame_idx - 1
         |    THEN 1 ELSE 0 END AS newseg
         |  FROM lg),
         |sg AS (
         |  SELECT doc_id, frame_idx, energy,
         |    sum(newseg) OVER (PARTITION BY doc_id ORDER BY frame_idx
         |      ROWS UNBOUNDED PRECEDING)::BIGINT AS seg_id
         |  FROM ns)
         |SELECT doc_id, seg_id, count(*)::BIGINT AS n_frames,
         |  min(frame_idx) AS start_frame,
         |  sum(energy)::BIGINT AS sum_energy
         |FROM sg GROUP BY doc_id, seg_id""".stripMargin
  )

  /** Shared by the `llm_mm_audio_energy` entry and the scene-cut
    * oracle's frame stream (so the two cannot drift).
    */
  private lazy val audioEnergyOracleSql: String =
    s"""SELECT doc_id, f AS frame_idx,
       |  list_reduce(
       |    list_prepend(0::BIGINT,
       |      list_transform(
       |        range(f * $FrameHop + 1,
       |              least(f * $FrameHop + $FrameLen, len(text)) + 1),
       |        i -> ord(substr(text, i::INT, 1))::BIGINT)),
       |    (a, c) -> a + c * c)::BIGINT AS energy
       |FROM documents,
       |  (SELECT unnest(range(0, 40)) AS f) ff
       |WHERE f * $FrameHop < len(text)""".stripMargin
}
