package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Attribute enrichment — the Spark form of the reference's SPARQL
  * stage (script/sparql.py:96 config_sparql): for each entity, gather
  * dozens of optional attributes, each with a human label, plus
  * counting sub-queries (workcount, conflictcount), and deduplicate
  * the cartesian product the property store returns.
  *
  * Spark-first shape: one **star join** — the entity key joins the
  * fact side once; label dimensions (nation, region) broadcast; the
  * OPTIONAL blocks become left joins; the DISTINCT-per-variable
  * semantics become `collect_set` (sorted for determinism); the
  * counting sub-selects become conditional aggregates over the same
  * shuffle instead of separate passes.
  */
object EnrichJoin {

  def enrichJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val nation = Tables.nation(spark, sfDir)
    val region = Tables.region(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)

    // label dimensions: broadcast, like the reference's rdfs:label lookups
    val labels = nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name").as("nation_label"),
        col("r_name").as("region_label"))

    // per-entity aggregates over one shuffle: workcount/conflictcount
    // analogs plus the deduplicated attribute lists
    val facts = ord.groupBy(col("o_custkey")).agg(
      count(lit(1)).as("workcount"),
      sum((col("o_orderpriority") === "1-URGENT").cast("long")).as("conflictcount"),
      array_sort(collect_set(col("o_orderstatus"))).as("statuses"),
      array_sort(collect_set(col("o_orderpriority"))).as("priorities"),
      sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)").as("spend"))

    cust
      .join(broadcast(labels), col("c_nationkey") === col("n_nationkey"), "left")
      .join(facts, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("nation_label"), col("region_label"),
        coalesce(col("workcount"), lit(0L)).as("workcount"),
        coalesce(col("conflictcount"), lit(0L)).as("conflictcount"),
        coalesce(col("statuses"), array()).as("statuses"),
        coalesce(col("priorities"), array()).as("priorities"),
        coalesce(col("spend"), lit(0).cast("decimal(18,2)")).as("spend"))
  }
}
