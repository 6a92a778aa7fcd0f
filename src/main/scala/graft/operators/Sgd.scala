package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed SGD with parameter averaging — linear & logistic regression.
  *
  * Capability parity with `multilinereg/multilinereg.java` and
  * `logisticreg/logisticreg.java` (identical skeletons; the sigmoid at
  * logisticreg.java:79 is the only difference), re-expressed Spark-first:
  *
  *  - The reference's per-map-task sequential SGD over a `static` θ
  *    (multilinereg.java:39, 41-97) becomes `mapPartitionsWithIndex` over a
  *    deterministically partitioned `Dataset[Obs]` (M3) — the classic
  *    parameter-mixing pattern (Zinkevich et al., parallelized SGD).
  *  - The HDFS θ side-file read by every mapper and rewritten by the driver
  *    each iteration (multilinereg.java:67-75, 160-170, 209-216) becomes a
  *    broadcast variable refreshed per iteration — O(numFeatures) state,
  *    zero filesystem round-trips.
  *  - The reducer's element-wise θ-snapshot sum + average over record count
  *    (A5, multilinereg.java:104-138) and AND-fold of continue flags (A6,
  *    :116,124) happen in the same partition pass; per-partition results are
  *    folded on the driver in partition order so the answer is bit-stable.
  *
  * Preserved quirky semantics (SURVEY.md §2.6, deliberately NOT fixed):
  *  - per record: flag_i = |h−y| > accuracy; θ is updated only when the
  *    record is outside tolerance (multilinereg.java:80-93);
  *  - the average is over per-RECORD θ snapshots, not per-partition finals
  *    (multilinereg.java:121-138);
  *  - training stops as soon as ANY single record is within tolerance
  *    (bool_and over flags; driver stops when false, multilinereg.java:202)
  *    or after maxIter = 50.
  *
  * Determinism: `repartition(numParts, id)` + `sortWithinPartitions(id)`
  * fixes both partition membership and fold order regardless of input
  * layout, so θ is reproducible run-to-run at a fixed partition count —
  * required for the verify harness, and the same discipline a
  * 1000-executor run needs (see [[numParts]] for how the count scales).
  *
  * Hyper-parameters from the reference: α = 0.03, accuracy = 0.01,
  * maxIter = 50 (multilinereg.java:146-151).
  */
object Sgd {
  val Alpha = 0.03
  val Accuracy = 0.01
  val MaxIter = 50

  /** SGD partition count: `graft.sgd.numPartitions` conf if set, else the
    * session's default parallelism (min 8). θ depends on the partition
    * count (coarser mixing with fewer partitions), so determinism requires
    * a FIXED count per run — which this is, for a fixed config — but NOT a
    * hardcoded constant: a constant 8 would shuffle 100 TB into 8
    * partitions (~12.5 TB each) and cap every epoch at 8 tasks. Tests that
    * assert run-to-run θ equality pin the conf explicitly.
    */
  def numParts(spark: SparkSession): Int =
    spark.conf.getOption("graft.sgd.numPartitions").map(_.toInt)
      .getOrElse(math.max(spark.sparkContext.defaultParallelism, 8))

  case class Obs(id: Long, y: Double, x: Array[Double])

  case class FitResult(theta: Array[Double], iterations: Int,
      converged: Boolean)

  /** Regression dataset from lineitem (FIXTURES.md canonical mapping),
    * scaled to O(1) magnitudes so the reference's α = 0.03 is stable.
    * x0 = 1.0 bias prepended exactly as multilinereg.java:61 does.
    */
  def dataset(spark: SparkSession, dir: String, logistic: Boolean)
      : Dataset[Obs] = {
    val s = spark; import s.implicits._
    val li = Tables(spark, dir, "lineitem")
    val y =
      if (logistic) when($"l_returnflag" === "R", 1.0).otherwise(0.0)
      else $"l_extendedprice" * (lit(1.0) - $"l_discount") / lit(100000.0)
    li.select(
        ($"l_orderkey" * 100 + $"l_linenumber").as("id"),
        y.as("y"),
        array(lit(1.0), $"l_quantity" / 50.0,
          $"l_extendedprice" / 100000.0, $"l_tax").as("x"))
      .as[Obs]
      .repartition(numParts(spark), $"id")
      .sortWithinPartitions("id")
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** One SGD pass: per-partition sequential fold emitting
    * (partitionId, allRecordsStillMoving, Σ per-record θ snapshots, n).
    */
  private def epoch(ds: Dataset[Obs], theta: Array[Double],
      logistic: Boolean): Array[(Int, Boolean, Array[Double], Long)] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(theta)
    val nf = theta.length
    val res = ds
      .mapPartitions { iter =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val th = bc.value.clone()
        val snapSum = new Array[Double](nf)
        var n = 0L
        var allCont = true
        iter.foreach { o =>
          var h = dot(th, o.x)
          if (logistic) h = 1.0 / (1.0 + math.exp(-h))
          val err = o.y - h
          if (math.abs(err) > Accuracy) {
            var i = 0
            while (i < nf) { th(i) += Alpha * err * o.x(i); i += 1 }
          } else allCont = false // this record converged → vote to stop
          var i = 0
          while (i < nf) { snapSum(i) += th(i); i += 1 }
          n += 1L
        }
        Iterator.single((pid, allCont, snapSum, n))
      }
      .collect()
    bc.unpersist()
    res.sortBy(_._1)
  }

  /** Iterative driver loop (M5): stop on the reference's any-record-
    * converged flag or maxIter. θ state never touches the data path.
    */
  def fit(ds: Dataset[Obs], numFeatures: Int, logistic: Boolean)
      : FitResult = {
    var theta = new Array[Double](numFeatures)
    var cont = true
    var it = 0
    while (cont && it < MaxIter) {
      val parts = epoch(ds, theta, logistic)
      val sum = new Array[Double](numFeatures)
      var n = 0L
      cont = true
      parts.foreach { case (_, flag, s, cnt) =>
        var i = 0
        while (i < numFeatures) { sum(i) += s(i); i += 1 }
        n += cnt
        cont &&= flag
      }
      if (n > 0) theta = sum.map(_ / n) else cont = false
      it += 1
    }
    FitResult(theta, it, !cont)
  }

  private def thetaDf(spark: SparkSession, dir: String, logistic: Boolean)
      : DataFrame = {
    val s = spark; import s.implicits._
    val ds = dataset(spark, dir, logistic).persist()
    try {
      val r = fit(ds, 4, logistic)
      Seq((r.theta(0), r.theta(1), r.theta(2), r.theta(3), r.iterations,
        r.converged))
        .toDF("theta_0", "theta_1", "theta_2", "theta_3", "iterations",
          "converged")
    } finally ds.unpersist()
  }

  /** OLS sufficient statistics of the SGD feature pipeline: the Gram
    * matrix Σ xᵢxⱼ (upper triangle) and moment vector Σ xᵢy as one row
    * of DECIMAL-stable sums. Two uses: it puts the regression FEATURE
    * pipeline (P2 positional extraction + scaling, exactly the columns
    * [[dataset]] feeds the iterative solver) under the DuckDB oracle,
    * and in closed form θ* = G⁻¹b is the exact answer the SGD
    * approximates — the spec solves the 4×4 system and checks the SGD θ
    * lands near it. Single global aggregate with map-side partials;
    * per-row products are identical IEEE doubles in both engines, and
    * the DECIMAL sum makes the reduction order-independent.
    */
  def gramMatrix(spark: SparkSession, dir: String): DataFrame = {
    val s = spark; import s.implicits._
    val x = Seq(lit(1.0), $"l_quantity" / 50.0,
      $"l_extendedprice" / 100000.0, $"l_tax")
    val y = $"l_extendedprice" * (lit(1.0) - $"l_discount") / lit(100000.0)
    // order-independent exact reduction; see graft.functions.StableSum
    // for why a direct double→DECIMAL cast would NOT be portable
    def dsum(c: Column): Column = graft.functions.StableSum.dsum(c)
    val gram = for { i <- 0 until 4; j <- i until 4 }
      yield dsum(x(i) * x(j)).as(s"g_${i}${j}")
    val mom = (0 until 4).map(i => dsum(x(i) * y).as(s"b_$i"))
    Tables(spark, dir, "lineitem")
      .agg((gram ++ mom).head, (gram ++ mom).tail: _*)
  }

  def linregTheta(spark: SparkSession, dir: String): DataFrame =
    thetaDf(spark, dir, logistic = false)

  def logregTheta(spark: SparkSession, dir: String): DataFrame =
    thetaDf(spark, dir, logistic = true)

  /** Non-SQL-expressible (iterative SGD with the reference's stop-flag
    * semantics has no DuckDB equivalent) → no oracle entries; verified by
    * `graft.SgdSpec` instead: bit-exact parity with a sequential
    * reference implementation, run-to-run determinism, stop-flag
    * semantics, convergence on noiseless data, and a single-exchange
    * plan guard (SURVEY.md §5.2).
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sgd_linreg_theta" -> linregTheta,
    "sgd_logreg_theta" -> logregTheta,
    "sgd_gram_matrix" -> gramMatrix
  )

  private val gramOracleSql: String = {
    val xs = Seq("1.0", "(l_quantity / 50.0)", "(l_extendedprice / 100000.0)",
      "l_tax")
    val y = "(l_extendedprice * (1.0 - l_discount) / 100000.0)"
    def dsum(t: String) = graft.functions.StableSum.dsumSql(t)
    val cols =
      (for { i <- 0 until 4; j <- i until 4 } yield
        s"${dsum(s"${xs(i)} * ${xs(j)}")} AS g_$i$j") ++
        (0 until 4).map(i => s"${dsum(s"${xs(i)} * $y")} AS b_$i")
    s"SELECT ${cols.mkString(", ")} FROM lineitem"
  }

  val oracle: Map[String, String] = Map(
    "sgd_gram_matrix" -> gramOracleSql)
}
