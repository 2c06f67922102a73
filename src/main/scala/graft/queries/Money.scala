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
}
