package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Grouped descriptive statistics — the profiling step a pipeline runs
  * before trusting a numeric column (and the moment-based math behind
  * z-scores, covariance matrices and feature scaling).
  *
  * Spark's own `corr`/`covar_samp`/`stddev` aggregate DOUBLES, whose
  * partial-merge order differs run to run — fine for analysis, fatal
  * for a bit-exact gate. Instead the five moments (n, Σx, Σy, Σx²,
  * Σy², Σxy) are aggregated EXACTLY: inputs snap to e2 fixed-point
  * longs, products stay in longs, sums wrap in decimal(38,0) (exact,
  * order-independent, map-side combinable). The classic closed forms
  *   corr  = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))
  *   covar = (n·Σxy − Σx·Σy) / (n·(n−1))   [sample]
  * then run ONCE per group on exact operands in a fixed expression
  * order, so both engines execute the identical IEEE operations.
  * Terminal stats are additionally rounded to 6 decimals to absorb any
  * last-ulp divergence in decimal→double conversion of >2^53 moments.
  */
object Stats {

  private def e2(c: Column): Column = round(c * 100).cast("long")

  /** Pearson correlation, sample covariance and stddevs of
    * (l_quantity, l_extendedprice) per return flag. One scan, one
    * shuffle on the 3-value grouping key, all moments map-side
    * combined — the shuffle carries a handful of longs per flag,
    * independent of SF.
    *
    * The moment sums stay PURE LONG in the hot loop (a decimal(38,0)
    * per-row wrap leaves Spark's compact-long aggregation path and
    * costs ~10× — measured 15.5s → ~1.5s at the 10× probe). The two
    * products that can overflow a long sum at large SF (y², x·y with
    * y ≤ 2^24) are split hi/lo around 2^25 / 2^20 per ROW and summed
    * as two longs each: sum_lo ≤ n·2^25 and sum_hi ≤ n·2^22 both hold
    * past SF 10^3; the exact wide moment reassembles ONCE per group as
    * decimal(38,0) — bit-identical to a direct wide sum, so the oracle
    * is untouched. x, x² and y sums fit a long directly to SF ~10^4. */
  def qCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val x = e2(col("l_quantity"))
    val y = e2(col("l_extendedprice"))
    Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .select(col("l_returnflag"), col("x"), col("y"),
        (col("y") * col("y")).as("yy"), (col("x") * col("y")).as("xy"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx_l"), sum(col("y")).as("sy_l"),
        sum(col("x") * col("x")).as("sxx_l"),
        sum(expr("yy div 33554432")).as("syy_hi"),
        sum(expr("yy % 33554432")).as("syy_lo"),
        sum(expr("xy div 1048576")).as("sxy_hi"),
        sum(expr("xy % 1048576")).as("sxy_lo"))
      .select(
        col("l_returnflag"), col("n"),
        col("sx_l").cast("decimal(38,0)").as("sx"),
        col("sy_l").cast("decimal(38,0)").as("sy"),
        col("sxx_l").cast("decimal(38,0)").as("sxx"),
        (col("syy_hi").cast("decimal(38,0)") * 33554432L + col("syy_lo")).as("syy"),
        (col("sxy_hi").cast("decimal(38,0)") * 1048576L + col("sxy_lo")).as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        // exact e2 sums back to unit scale for reporting
        (col("sx").cast("double") / 100.0).as("sum_qty"),
        (col("sy").cast("double") / 100.0).as("sum_price"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
          .as("corr_qty_price"),
        // covariance in unit² scale: divide the e4 moment by 10^4
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n").cast("double") * (col("n") - 1).cast("double")) / 10000.0, 6)
          .as("covar_qty_price"),
        round(sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) /
          col("n").cast("double") / 100.0 * sqrt(col("n").cast("double") /
            (col("n") - 1).cast("double")), 6).as("stddev_qty"))
  }
}
