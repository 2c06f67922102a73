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
private[queries] trait MoneyArithmetic {
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
}
