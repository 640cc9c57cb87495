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
        coalesce(col("spend").cast("double"), lit(0.0)).as("spend"))
  }

  /** The full-breadth enrichment — the analogue of the reference's ~46
    * optional SPARQL attribute keys with labels (script/sparql.py:96
    * config_sparql: 19 multi-valued families + counts + authority IDs +
    * media URLs): one pass over the fact table computes EVERY
    * conditional aggregate in the same shuffle (each OPTIONAL block a
    * conditional agg, each DISTINCT-per-variable a collect_set, each
    * counting sub-query a filtered count), labels broadcast, entity
    * attributes carried through; the per-entity identifier families
    * (viafID/bnfID/isniID/congressID/idrefID, image/signature URLs)
    * are row-local derivations on the entity side — zero extra cost.
    * Adding an attribute adds a column, never a pass. */
  def enrichWide(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val nation = Tables.nation(spark, sfDir)
    val region = Tables.region(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)

    val labels = nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name").as("nation_label"),
        col("r_name").as("region_label"))

    def nStatus(s: String) = sum((col("o_orderstatus") === s).cast("long"))
    def nPrio(p: String) = sum((col("o_orderpriority") === p).cast("long"))
    def nQuarter(q: Int) = sum((quarter(col("o_orderdate")) === q).cast("long"))
    def spendWhere(c: org.apache.spark.sql.Column) =
      sum(when(c, col("o_totalprice").cast("decimal(18,2)")))
        .cast("decimal(18,2)").cast("double")
    val spend = sum(col("o_totalprice").cast("decimal(18,2)"))

    val facts = ord.groupBy(col("o_custkey")).agg(
      count(lit(1)).as("workcount"),
      sum((col("o_orderpriority") === "1-URGENT").cast("long")).as("conflictcount"),
      nStatus("O").as("n_open"), nStatus("F").as("n_finished"), nStatus("P").as("n_pending"),
      nPrio("1-URGENT").as("n_urgent"), nPrio("2-HIGH").as("n_high"),
      nPrio("3-MEDIUM").as("n_medium"), nPrio("4-NOT SPECIFIED").as("n_notspec"),
      nPrio("5-LOW").as("n_low"),
      nQuarter(1).as("n_q1"), nQuarter(2).as("n_q2"),
      nQuarter(3).as("n_q3"), nQuarter(4).as("n_q4"),
      min(col("o_orderdate")).as("first_order"), max(col("o_orderdate")).as("last_order"),
      min(year(col("o_orderdate"))).cast("long").as("first_year"),
      max(year(col("o_orderdate"))).cast("long").as("last_year"),
      // size(collect_set) not count_distinct: the exact-distinct agg
      // plans as a second Expand+Exchange phase, while the set (≤ a few
      // years per customer) rides the ObjectHashAggregate the
      // collect_set columns already pay for — one shuffle, not two
      size(collect_set(year(col("o_orderdate")))).cast("long").as("active_years"),
      spend.cast("decimal(18,2)").cast("double").as("total_spend"),
      max(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("max_spend"),
      min(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("min_spend"),
      spendWhere(col("o_orderstatus") === "O").as("open_spend"),
      spendWhere(col("o_orderstatus") === "F").as("finished_spend"),
      spendWhere(col("o_orderpriority") === "1-URGENT").as("urgent_spend"),
      sum((col("o_totalprice") > 200000.0).cast("long")).as("n_large"),
      array_sort(collect_set(col("o_orderstatus"))).as("statuses"),
      array_sort(collect_set(col("o_orderpriority"))).as("priorities"),
      array_sort(collect_set(month(col("o_orderdate")))).as("active_months"))

    cust
      .join(broadcast(labels), col("c_nationkey") === col("n_nationkey"), "left")
      .join(facts, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal").cast("double").as("acctbal"),
        col("nation_label"), col("region_label"),
        // authority-ID families (viafID/bnfID/isniID/congressID/idrefID,
        // sparql.py:153-160) — deterministic per-entity derivations
        concat(lit("viaf"), (col("c_custkey") * 7 + 1).cast("string")).as("viaf_id"),
        concat(lit("cb"), (col("c_custkey") * 13 + 5).cast("string")).as("bnf_id"),
        concat(lit("isni"), lpad(pmod(col("c_custkey"), lit(100000000)).cast("string"), 8, "0")).as("isni_id"),
        concat(lit("n"), (col("c_custkey") * 3 + 11).cast("string")).as("congress_id"),
        concat(lit("idref"), (col("c_custkey") * 5 + 2).cast("string")).as("idref_id"),
        // image/signature URL families (sparql.py:139-140)
        concat(lit("https://commons.example/portrait/"),
          col("c_custkey").cast("string"), lit(".jpg")).as("image_url"),
        concat(lit("https://commons.example/signature/"),
          col("c_custkey").cast("string"), lit(".svg")).as("signature_url"),
        coalesce(col("workcount"), lit(0L)).as("workcount"),
        coalesce(col("conflictcount"), lit(0L)).as("conflictcount"),
        coalesce(col("n_open"), lit(0L)).as("n_open"),
        coalesce(col("n_finished"), lit(0L)).as("n_finished"),
        coalesce(col("n_pending"), lit(0L)).as("n_pending"),
        coalesce(col("n_urgent"), lit(0L)).as("n_urgent"),
        coalesce(col("n_high"), lit(0L)).as("n_high"),
        coalesce(col("n_medium"), lit(0L)).as("n_medium"),
        coalesce(col("n_notspec"), lit(0L)).as("n_notspec"),
        coalesce(col("n_low"), lit(0L)).as("n_low"),
        coalesce(col("n_q1"), lit(0L)).as("n_q1"),
        coalesce(col("n_q2"), lit(0L)).as("n_q2"),
        coalesce(col("n_q3"), lit(0L)).as("n_q3"),
        coalesce(col("n_q4"), lit(0L)).as("n_q4"),
        col("first_order"), col("last_order"),
        col("first_year"), col("last_year"),
        datediff(col("last_order"), col("first_order")).cast("long").as("span_days"),
        coalesce(col("active_years"), lit(0L)).as("active_years"),
        coalesce(col("total_spend"), lit(0.0)).as("total_spend"),
        col("max_spend"), col("min_spend"),
        when(col("workcount") > 0, col("total_spend") / col("workcount")).as("avg_spend"),
        col("open_spend"), col("finished_spend"), col("urgent_spend"),
        coalesce(col("n_large"), lit(0L)).as("n_large"),
        coalesce(col("statuses"), array()).as("statuses"),
        coalesce(col("priorities"), array()).as("priorities"),
        coalesce(col("active_months"), array().cast("array<int>")).as("active_months"))
  }
}
