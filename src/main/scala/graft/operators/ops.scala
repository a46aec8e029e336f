package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared numeric helpers for oracle-parity.
  *
  * Spark's `round(double, n)` goes through `BigDecimal.valueOf`
  * (shortest-decimal-string of the double) while DuckDB rounds the
  * binary value directly — they disagree on e.g. 36639.504999999997.
  * `floor(x*10^n + 0.5)/10^n` is pure IEEE arithmetic and evaluates
  * bit-identically in both engines, so every rounded output column
  * uses it (Spark side here, `floor(x*100+0.5)/100` in oracle SQL).
  */
object ops {
  def r2(c: Column): Column = floor(c * 100.0 + 0.5) / 100.0
  def r4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0
  def r6(c: Column): Column = floor(c * 1000000.0 + 0.5) / 1000000.0

  /** Oracle-SQL fragment equivalents. */
  def R2(e: String): String = s"floor(($e)*100.0 + 0.5)/100.0"
  def R4(e: String): String = s"floor(($e)*10000.0 + 0.5)/10000.0"
  def R6(e: String): String = s"floor(($e)*1000000.0 + 0.5)/1000000.0"
}
