package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The DECIMAL-stable double summation shared by every operator whose
  * float aggregate must hash-match the DuckDB oracle under ANY
  * partitioning ([[graft.operators.Sgd.gramMatrix]],
  * [[graft.operators.Similarity.embCentroidsOf]]).
  *
  * Per-row quantization happens in PURE double arithmetic —
  * floor(x·10¹²) is exact and bit-identical in any engine as long as
  * |x|·10¹² < 2⁵³ (true for all users: inputs are unit-scale features /
  * embedding coordinates) — then the integers sum exactly in
  * DECIMAL(38,0), making the reduction order-independent, and one final
  * division restores the scale. A direct double→DECIMAL(p,s) cast is
  * NOT portable: Spark rounds the shortest decimal string (Java
  * `BigDecimal(double.toString)`), DuckDB the exact binary expansion,
  * and the two disagree on near-half digit patterns (~1e-12 per
  * affected row — measured 4.2e-11 drift on the sf0.01 moment vector,
  * i.e. dozens of rows per 60k). Keep the Column and SQL forms in
  * lockstep — they are two spellings of one numeric contract.
  */
object StableSum {

  /** Order-independent Σc, exact while |c|·10¹² < 2⁵³. */
  def dsum(c: Column): Column =
    sum(floor(c * lit(1e12)).cast("decimal(38,0)")).cast("double") /
      lit(1e12)

  /** The identical reduction in DuckDB SQL, for oracle queries. */
  def dsumSql(t: String): String =
    s"CAST(SUM(CAST(FLOOR(($t) * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12"

  /** DECIMAL→BIGINT narrowing that FAILS LOUDLY past the documented
    * range contract instead of wrapping: Spark's non-ANSI
    * DECIMAL(38,0)→LONG cast silently wraps on overflow while the
    * DuckDB oracle's HUGEINT→BIGINT cast raises — past the contract the
    * two engines would diverge silently (wrong BIGINT vs hard failure).
    * Used by the BIGINT-hardened audit columns (`tv_num`, `kappa_num`,
    * `auc_num2`) whose inputs are bounded by n²-class products the
    * operator docstrings argue < 2⁶² at the per-shard audit sizes.
    *
    * NULL input also raises, with its own message: the audit columns
    * this guards are aggregates over non-empty groups, so a NULL here
    * is never a legitimate value — it is either a misuse (empty group)
    * or, worse, a DECIMAL(38,0) sum that itself overflowed to NULL
    * under non-ANSI mode (DuckDB's HUGEINT would have raised). Mapping
    * it onto the generic "exceeds BIGINT" text (what the NULL-valued
    * `when` condition used to fall through to) misnamed the cause;
    * propagating NULL would hide the overflow case entirely.
    */
  def checkedLong(c: Column, what: String): Column =
    when(c.isNull, raise_error(lit(
        s"graft: $what is NULL — empty aggregate or DECIMAL(38,0) " +
          "overflow; shard the audit")).cast("long"))
      .when(abs(c) <= lit(Long.MaxValue).cast("decimal(38,0)"), c.cast("long"))
      .otherwise(raise_error(lit(
        s"graft: $what exceeds BIGINT — out of the documented size " +
          "contract; shard the audit")).cast("long"))
}
