package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-decimal money arithmetic, shared by every gate query that
  * aggregates currency (Relational TPC-H shapes, BloomPrune, specs).
  *
  * The oracle semantics are "snap each double to DECIMAL(18,2),
  * multiply exactly, sum exactly" — but a per-row decimal×decimal
  * multiply leaves Spark's long-backed fast path (intermediate
  * precision > 18) and allocates BigDecimals, ~4× a query's cost.
  * Equivalent fixed-point form: money as long hundredths, products as
  * long e4/e6 (exact integers, same values), ONE long-backed decimal
  * wrap for the overflow-safe sum, one scale shift after aggregation.
  *
  * Exactness bound: a long-backed DECIMAL(18,x) holds ≤18 significant
  * digits; sums stay exact up to roughly SF 10^4 (see
  * queries/Relational.scala header for the full ulp analysis). */
object Money {
  /** Snap to the oracle's DECIMAL(18,2) reading of a money double. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")
  /** value*100 as long (exact: inputs carry ≤2 decimals). */
  def e2(c: Column): Column = round(c * 100).cast("long")
  /** l_extendedprice*(1-l_discount) in e4 fixed point, exact. */
  def discPriceE4: Column =
    e2(col("l_extendedprice")) * (lit(100L) - e2(col("l_discount")))
  /** discPrice*(1+l_tax) in e6 fixed point, exact. */
  def chargeE6: Column =
    discPriceE4 * (lit(100L) + e2(col("l_tax")))
  /** Overflow-safe exact sum of a fixed-point long, rescaled: the
    * per-row decimal(18,0) wrap stays on the compact-long fast path,
    * the division is exact (integer / power of ten at target scale). */
  def sumFixed(c: Column, div: Long, scale: Int): Column =
    (sum(c.cast("decimal(18,0)")) / lit(div)).cast(s"decimal(18,$scale)")

  /** Terminal-double form for fixed-point sums whose MANTISSA outgrows
    * 2^53 (e6 money at sf ≥ ~1): `decimal(18,6) → double` is then a
    * 17-significant-digit conversion that Spark single-rounds
    * (BigDecimal.doubleValue) but DuckDB double-rounds (int128
    * mantissa → double, then ÷10^scale) — a last-ulp hash mismatch at
    * the sf1 gate. Fix is sequence-identical arithmetic on both
    * engines: sum the exact integer, convert THE INTEGER to double
    * (one correctly-rounded conversion each), then divide in double —
    * the oracle mirrors as CAST(sum(BIGINT e6) AS DOUBLE) / div. */
  def sumFixedDouble(c: Column, div: Long): Column =
    sum(c.cast("decimal(18,0)")).cast("double") / lit(div.toDouble)
}
