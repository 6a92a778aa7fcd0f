package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the empirical scaling study
  * (r16): writes `factor`× copies of the sf0.1 fixtures to a scratch
  * dir (the driver fixtures are read-only), so Bench/Verify can run at
  * sf≈1 and per-entry `t(sf1)/t(sf0.1)` ratios become MEASURED scaling
  * exponents instead of plan-shape arguments (BASELINE.md "Round-16
  * scaling exponents").
  *
  * Scaling model — how a 10× corpus actually grows:
  *   - FACT tables (`orders`, `lineitem`, `customer`, `events`,
  *     `documents`, `embeddings`) get `factor` copies with their keys
  *     rebased by `copy × STRIDE` (consistently across foreign keys:
  *     a copy's lineitems still join its orders, its orders its
  *     customers), so per-entity fan-outs stay constant while entity
  *     counts scale — the shape of real growth.
  *   - CATALOG tables (`region`, `nation`, `part`, `supplier`) stay
  *     fixed: more transactions over the same part vocabulary keeps
  *     relative itemset supports constant (apriori finds the same
  *     frequent sets from 10× the counting work) and keeps the
  *     dimension side of every join broadcast-sized, exactly as a
  *     1000-executor deployment would see.
  *   - `documents.text` is SALTED per copy (a copy-tagged token every
  *     3rd position, so every 4-gram shingle window of copy k differs
  *     from copy j≠k): within-copy near-duplicate structure is
  *     preserved (both members of a dup pair get the same salt), while
  *     cross-copy Jaccard collapses to ~0 — naive replication would
  *     make every doc a 10-way exact clone and grow dedup candidate
  *     pairs quadratically in `factor`, a workload real 10× data does
  *     not present. `n_chars` is recomputed from the salted text.
  *   - `embeddings.embedding` is ROTATED per copy (circular shift by
  *     1 + (copy-1) mod (dim-1) positions): rotation preserves norms
  *     and all within-copy pairwise distances (each copy replays the
  *     original neighbor structure) while cross-copy similarity
  *     decorrelates — the ANN/near-dup workload of a genuinely larger
  *     corpus.
  *   - `customer.c_name` gets a per-copy suffix so name cardinality
  *     scales with the data (distinct-counts stay honest).
  *
  * Everything is a pure function of the source rows and the copy
  * index — re-running reproduces the same dataset bit-for-bit modulo
  * parquet row order, which no query result depends on (the suite's
  * oracle compare sorts rows).
  *
  * Usage: `runMain graft.ScaleUp [srcDir] [outDir] [factor]`
  * (defaults `/root/testdata/sf0.1` → `scratch/sf1` × 10).
  */
object ScaleUp {

  /** Key-rebase stride per copy — above every key in the sf0.1
    * fixtures (max observed: l_orderkey 600k) by >10×, so rebased key
    * spaces never collide at any factor ≤ 1000.
    */
  val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "scratch/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(Tables.RequiredConf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // copy indexes 0..factor-1; copy 0 is the original rows unchanged,
    // so sf0.1 is a strict subset of the generated data
    def fanned(table: String): DataFrame =
      spark.read.parquet(s"$src/$table.parquet")
        .crossJoin(broadcast(spark.range(factor).toDF("cp")))
    def rebase(c: String) = (col(c) + col("cp") * Stride).as(c)

    val catalog = Seq("region", "nation", "part", "supplier")
    val outFiles = math.max(4, Integer.parseInt(cpus))

    def write(table: String, df: DataFrame, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[scaleup] $table x$factor -> $out/$table.parquet")
    }

    catalog.foreach { t =>
      write(t, spark.read.parquet(s"$src/$t.parquet"), 1)
    }

    write("customer", fanned("customer").select(
      rebase("c_custkey"),
      when(col("cp") === 0, col("c_name"))
        .otherwise(concat(col("c_name"), lit("_"), col("cp")))
        .as("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      outFiles)

    write("orders", fanned("orders").select(
      rebase("o_orderkey"), rebase("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")),
      outFiles)

    write("lineitem", fanned("lineitem").select(
      rebase("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")),
      outFiles)

    write("events", fanned("events").select(
      rebase("event_id"), col("ts"), rebase("user_id"),
      col("event_type"), col("value"), col("props")),
      outFiles)

    // per-copy salt token every 3rd position: every 4-gram shingle
    // window contains at least one salt token, so shingle sets of
    // different copies are disjoint while a copy's internal
    // near-duplicate pairs (same salt, aligned positions) survive
    val salted = when(col("cp") === 0, col("text")).otherwise(
      expr("array_join(transform(split(text, ' '), (t, i) -> " +
        "if(i % 3 = 2, concat(t, ' zzsc', cast(cp as string)), t)), ' ')"))
    write("documents", fanned("documents").select(
      rebase("doc_id"), salted.as("text"), col("lang"), col("source"),
      length(salted).cast("long").as("n_chars")),
      outFiles)

    // circular rotation by 1..dim-1 positions for copies > 0 —
    // norm- and within-copy-distance-preserving, cross-copy
    // decorrelating
    val rotated = expr(
      "case when cp = 0 then embedding else " +
      "concat(slice(embedding, cast(1 + (cp - 1) % (size(embedding) - 1) " +
        "as int) + 1, size(embedding)), " +
      "slice(embedding, 1, cast(1 + (cp - 1) % (size(embedding) - 1) " +
        "as int))) end")
    write("embeddings", fanned("embeddings").select(
      rebase("vec_id"), rotated.as("embedding"), col("label")),
      outFiles)

    println(s"""{"scaleup":"done","src":${Bench.q(src)},""" +
      s""""out":${Bench.q(out)},"factor":$factor}""")
    spark.stop()
  }
}
