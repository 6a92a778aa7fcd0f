package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The md5-derived uniform in [0, 1) shared by every deterministic
  * sampling / sketching decision that must replay bit-identically in the
  * DuckDB oracle ([[graft.operators.Curation.sampleStratifiedOf]],
  * [[graft.operators.TextOps.distinctKmvOf]]): the first 8 hex digits of
  * md5 as an integer, divided by 2³² — a power of two, so the division
  * is EXACT in IEEE doubles and both engines compare the same bits.
  * Keep the Column and SQL forms in lockstep.
  */
object Md5Uniform {

  /** u(c) ∈ [0, 1); c is rendered as a string first (no-op for strings,
    * and long→string matches BIGINT::VARCHAR).
    */
  def uniform(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") /
      lit(4294967296.0)

  /** The identical uniform in DuckDB SQL. */
  def sql(t: String): String =
    s"(('0x' || substr(md5(($t)::VARCHAR), 1, 8))::BIGINT::DOUBLE" +
      " / 4294967296.0)"
}
