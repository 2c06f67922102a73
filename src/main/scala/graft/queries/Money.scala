package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The determinism-critical money arithmetic shared by every analytics
  * module (SURVEY.md §5 rule 1): cast BASE columns to DECIMAL first, do
  * exact decimal arithmetic, cast only the final aggregate to DOUBLE.
  * Casting a *computed* double to decimal rounds the binary expansion
  * differently in Spark vs DuckDB — one shared definition so a future
  * determinism fix cannot diverge between modules.
  */
private[graft] trait MoneyArithmetic {
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Exact decimal "1.00" so 1-x / 1+x keeps tight precision in both engines. */
  val one: Column = lit(new java.math.BigDecimal("1.00"))
  def pct(c: Column): Column = c.cast(DecimalType(4, 2))
  /** ep*(1-disc) with decimal-first arithmetic. */
  def discPrice: Column = dec2(col("l_extendedprice")) * (one - pct(col("l_discount")))
  /** discPrice*(1+tax). */
  def charge: Column = discPrice * (one + pct(col("l_tax")))

  /** Decimal aggregate → DOUBLE, deterministic across engines even when
    * the UNSCALED value exceeds 2^53 (the r7 sf1 lesson: q1's sum_charge,
    * unscaled 2.8e16, diverged by 1 ulp because Spark's and DuckDB's
    * direct decimal→double casts double-round differently up there).
    * Route through the exact unscaled BIGINT, then ONE long→double
    * conversion and ONE division by the power-of-ten double — identical
    * IEEE operations on identical operands in both engines. Below 2^53
    * this equals the correctly-rounded direct cast, so gate results at
    * smaller SFs are unchanged. SQL twin: [[stableDoubleSql]].
    */
  def stableDouble(sumDec: Column, scale: Int): Column = {
    val factor = math.pow(10, scale).toLong
    (sumDec * lit(factor)).cast("long").cast("double") / lit(factor.toDouble)
  }

  def stableDoubleSql(sumSql: String, scale: Int): String = {
    val factor = math.pow(10, scale).toLong
    s"CAST(CAST(($sumSql) * $factor AS BIGINT) AS DOUBLE) / CAST($factor AS DOUBLE)"
  }
  // 2^53 AUDIT (r7): a decimal aggregate's direct double cast is
  // cross-engine-safe while |unscaled value| < 2^53 ≈ 9.0e15. Audit of
  // every money cast in the registry by (scale, coarsest grouping):
  //  - scale 6 (charge): a flag-group sum crosses at sf1 -> q1 uses
  //    stableDouble (the one observed divergence).
  //  - scale 4 (discPrice): a FULL-corpus 1-row sum (2.2e15 unscaled at
  //    sf1) crosses around sf4; the registry's coarsest scale-4 groups
  //    (q6's one-year slice, q14's month, q8's year x nation-pair) sit
  //    1-2 orders below that — safe through ~sf40.
  //  - scale 2 (totalprice/extendedprice/acctbal): full-corpus cumulative
  //    sums (win_running_revenue's last frame) cross around sf400.
  // Rule: any NEW aggregate whose unscaled magnitude can reach 2^53 at a
  // gate SF takes stableDouble from day one; the existing sites above get
  // it when the gate SF ladder approaches their threshold.
}

/** Shared instance for cross-module/spec consumers of the money rules. */
private[graft] object Money extends MoneyArithmetic
