package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Market-basket association rules over the order→part bipartite
  * relation: pairwise co-occurrence support, directional confidence,
  * and lift — the first (and at corpus scale, usually only) iteration
  * of frequent-itemset mining.
  *
  * Scale shape: pair generation is a per-order self-join, so fan-out
  * is C(items-per-order, 2) — bounded by basket size, never by
  * catalog size. Three aggregates (pair counts, item counts, order
  * count) each map-side combine; the scalar order count broadcasts and
  * the catalog-sized item counts join under AQE's size decision. Every metric is exact-long arithmetic ending
  * in ONE IEEE divide (support = c_ab/n, conf = c_ab/c_a,
  * lift = (c_ab·n)/(c_a·c_b)), so no rounding is needed for the
  * cross-engine compare. */
object Basket {

  /** Minimum pair count for an emitted rule. */
  final val MinSupport = 2L

  def assocRules(spark: SparkSession, sfDir: String): DataFrame = {
    // dedup inside an EXPLICIT hash(ok) layout (the Graph.scala trick):
    // HashPartitioning(ok) satisfies the dedup's ClusteredDistribution
    // (ok, pk), the self-join's ClusteredDistribution(ok), AND the
    // order-count distinct — so the one repartition exchange is built
    // once and ReusedExchange feeds every consumer, where the earlier
    // bare distinct() re-shuffled per subtree (6 exchanges, 4 replays
    // of the scan+dedup)
    val n = spark.sessionState.conf.numShufflePartitions
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .repartition(n, col("ok"))
      .dropDuplicates("ok", "pk")
    // SHUFFLE_HASH pin (r9→r10): the dedup'd fact side sits right at
    // the 10 MB AQE broadcast threshold at sf0.1, so the self-join
    // flipped between BroadcastHashJoin and the reused-exchange plan
    // run-to-run (the r9 bench's 7.4s-vs-3.4s anomaly class). Measured
    // identical warm cost on both paths (~1.5-2.5s), and at scale the
    // fact side must never broadcast — pin the partitioned hash join so
    // the plan is the same one the 100 TB run would execute. Both sides
    // still come from the ONE hash(ok) exchange (ReusedExchange).
    val pairCounts = items.as("a").hint("shuffle_hash")
      .join(items.as("b").hint("shuffle_hash"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= MinSupport)
    val itemCounts = items.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val orderCount = items.select(col("ok")).dropDuplicates("ok")
      .agg(count(lit(1)).as("n_orders"))
    // itemCounts is catalog-sized (SF-proportional): no broadcast
    // hint — AQE broadcasts while it fits and degrades to a shuffle
    // join instead of an 8 GB-limit failure at larger scale. Only the
    // 1-row order count is force-broadcast.
    pairCounts
      .join(itemCounts.select(col("pk").as("part_a"), col("n_item").as("n_a")), Seq("part_a"))
      .join(itemCounts.select(col("pk").as("part_b"), col("n_item").as("n_b")), Seq("part_b"))
      .crossJoin(broadcast(orderCount))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / col("n_orders").cast("double")).as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("conf_ab"),
        (col("n_ab").cast("double") / col("n_b").cast("double")).as("conf_ba"),
        ((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }
}
