package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew salting — the fallback when AQE's runtime skew-join
  * split can't apply (e.g. the skewed side feeds an aggregation first,
  * or the join is inside a cached subplan). A hot key's rows scatter
  * over `salts` sub-keys; the small side replicates `salts`× so every
  * sub-key still finds its match. Shuffle partitions then bound at
  * (hot-key volume / salts) instead of the full hot key.
  */
object Salting {

  /** Equi-join `big ⋈ small` on `key`, salting the big side by a
    * deterministic per-row hash of `bigRowId`. Result rows are exactly
    * the unsalted join's. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigRowId: String, salts: Int): DataFrame = {
    val salted = big.withColumn("_salt", pmod(xxhash64(col(bigRowId)), lit(salts)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation under key skew: partial agg on (key, salt),
    * final agg on key. For algebraic aggregates Spark's map-side
    * combine already does this implicitly; the explicit form is for
    * holistic aggregates (collect_list/set) where one reducer would
    * otherwise take the whole hot key. */
  def saltedCollectSet(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(valueCol)), lit(salts)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(collect_set(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(array_sort(array_distinct(flatten(collect_list(col("_partial"))))).as("values"))

  /** Gate form: the holistic collect over orders keyed by
    * o_orderstatus — 3 values across the whole table, the worst skew a
    * groupBy can meet. The salt bounds any single reduce task at
    * (hot key / salts) rows; the oracle certifies the salted plan is
    * value-identical to the unsalted semantics. */
  def skewAgg(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    saltedCollectSet(graft.sources.Tables.orders(spark, sfDir),
        "o_orderstatus", "o_orderpriority", 8)
      .withColumnRenamed("values", "priorities")
}
