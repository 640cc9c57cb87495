package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

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

  /** Gate form of `saltedJoin`: the order table joined to a 3-row
    * status dimension on o_orderstatus — a 3-value join key is the
    * worst skew an equi-join can meet (every row of a hot status lands
    * on one reducer in the naive plan). The salt scatters each status
    * over 8 sub-keys and replicates the dimension 8×, bounding any
    * task at (hot status / 8); the oracle certifies the salted plan is
    * value-identical to the plain join. Output re-aggregates to
    * status×priority cells so the gate row stays small. */
  def skewJoin(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val orders = graft.sources.Tables.orders(spark, sfDir)
    val dim = orders.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("status_total"))
    saltedJoin(orders, dim, "o_orderstatus", "o_orderkey", 8)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), max(col("status_total")).as("status_total"))
      .withColumn("status_share",
        round(col("n_orders").cast("double") / col("status_total").cast("double"), 6))
  }

  /** Shuffle width the profiler judges against (the session default;
    * a deployment passes its reducer count). */
  final val DetectWidth = 32L

  /** PRE-JOIN KEY-SKEW PROFILER — the detection counterpart of the
    * salted executors above: before shuffling 100 TB on a key,
    * profile it. Two distinct pathologies surface, and they need
    * different numbers: CROSS-KEY IMBALANCE (skew_ratio =
    * max_key_count/(rows/keys) — one customer 100× hotter than the
    * average) and LOW CARDINALITY (the hottest key's absolute share
    * max_part_share = max_cnt/rows — o_orderstatus is perfectly
    * balanced across its 3 values yet one reducer would take 34% of
    * the table). The actionable flag is width-anchored: flagged iff
    * the hot key exceeds the ideal 1/DetectWidth partition share
    * (exact integer compare max_cnt·width > rows), with
    * rec_salts = ⌈max_cnt·width/rows⌉ capped at width — the factor
    * that scatters the hot key back to ideal-partition volume.
    * Profiled on o_orderstatus (flagged, salts 11) vs o_custkey
    * (clean) — the contrast the flag must separate.
    *
    * Scale shape: one map-side-combined count per key column (output
    * is key-cardinality sized), a one-row stats fold, and a broadcast
    * filter for the argmax — nothing row-scale ever shuffles twice. */
  def skewDetect(spark: SparkSession, sfDir: String): DataFrame = {
    def profile(keyCol: String): DataFrame = {
      val counts = Tables.orders(spark, sfDir)
        .groupBy(col(keyCol).cast("string").as("k")).agg(count(lit(1)).as("n"))
      val stats = counts.agg(count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"), max(col("n")).as("max_cnt"))
      val top = counts.crossJoin(broadcast(stats))
        .filter(col("n") === col("max_cnt"))
        .agg(min(col("k")).as("top_key"))
      stats.crossJoin(broadcast(top))
        .select(lit(keyCol).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_cnt"), col("top_key"),
          round((col("max_cnt") * col("n_keys")).cast("double") /
            col("n_rows").cast("double"), 6).as("skew_ratio"),
          round(col("max_cnt").cast("double") / col("n_rows").cast("double"), 6)
            .as("max_part_share"),
          least(lit(DetectWidth),
            expr(s"(max_cnt * $DetectWidth + n_rows - 1) div n_rows"))
            .as("rec_salts"),
          (col("max_cnt") * DetectWidth > col("n_rows")).as("flagged"))
    }
    profile("o_orderstatus").unionByName(profile("o_custkey"))
  }
}
