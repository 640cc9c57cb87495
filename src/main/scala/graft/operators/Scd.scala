package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Warehouse maintenance operators: slowly-changing-dimension history
  * build and MERGE-style upsert application — the write-side half of a
  * dimension pipeline (the reference's wd2tei stage is exactly this
  * shape: join a change feed onto a target and rewrite it,
  * /root/reference/script/wd2tei.py:34).
  */
object Scd {

  /** SCD type-2 history from an ordered change feed: each customer's
    * order-status stream collapses to its change points; every change
    * point becomes a dimension version with [valid_from, valid_to)
    * and an is_current flag.
    *
    * Shape: one shuffle on the natural key; BOTH windows (change
    * detection via lag, close-out via lead) share that partitioning, so
    * Catalyst plans a single exchange + sort. Per-key partitions are
    * bounded by a customer's order count — no global sort, no driver
    * state, works identically on a 100 TB feed. */
  def scd2Dim(spark: SparkSession, sfDir: String): DataFrame = {
    val byKey = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val changes = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"))
      .withColumn("prev_status", lag(col("o_orderstatus"), 1).over(byKey))
      // keep only change points: first row or a status flip
      .filter(col("prev_status").isNull || col("prev_status") =!= col("o_orderstatus"))
    changes
      .withColumn("version", row_number().over(byKey).cast("long"))
      .withColumn("valid_from", col("o_orderdate"))
      .withColumn("valid_to", lead(col("o_orderdate"), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("o_custkey").as("custkey"), col("version"),
        col("o_orderstatus").as("status"), col("valid_from"), col("valid_to"),
        col("is_current"))
  }

  /** MERGE INTO semantics as one full-outer join pass: target =
    * customer dim; source = a deterministic change feed (per-customer
    * order rollup = updates, plus an insert stream of synthetic keys
    * offset by 10^12 — far past any real custkey (150k x SF would need
    * SF ~ 10^7 to collide) so inserts can never alias an update key).
    *   WHEN MATCHED AND src.del  THEN DELETE
    *   WHEN MATCHED               THEN UPDATE (acctbal += delta)
    *   WHEN NOT MATCHED BY TARGET THEN INSERT
    *   (unmatched target rows pass through unchanged)
    * A real lakehouse MERGE is exactly this join + per-row action
    * arbitration; file-level pruning (the other half) is what
    * zorder_layout demonstrates. The join key is the dim key — one
    * shuffle each side, AQE handles skew. */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val target = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_acctbal").cast("decimal(18,2)").as("acctbal"),
        col("c_mktsegment").as("segment"))
    val ord = Tables.orders(spark, sfDir)
    // updates: spend delta per existing customer; deletes: customers
    // whose every order is finished ('F') AND key mod 7 = 0
    val upd = ord.groupBy(col("o_custkey"))
      .agg(sum(when(col("o_orderstatus") === "O",
            col("o_totalprice").cast("decimal(18,2)")).otherwise(lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").as("delta"),
        max(when(col("o_orderstatus") =!= "F", lit(1)).otherwise(lit(0))).as("any_open"))
      .select(col("o_custkey").as("key"), col("delta"),
        (col("any_open") === 0 && col("o_custkey") % 7 === 0).as("del"))
    // inserts: one synthetic prospect per urgent-priority order bucket
    val ins = ord.filter(col("o_orderpriority") === "1-URGENT")
      .select((col("o_custkey") + 1000000000000L).as("key")).distinct()
      .withColumn("delta", lit(0).cast("decimal(18,2)"))
      .withColumn("del", lit(false))
    val source = upd.unionByName(ins)
    target.join(source, Seq("key"), "full_outer")
      .withColumn("action",
        when(col("name").isNull, lit("insert"))
          .when(col("del"), lit("delete"))
          .when(col("delta").isNotNull, lit("update"))
          .otherwise(lit("keep")))
      .filter(col("action") =!= "delete")
      .select(col("key"),
        coalesce(col("name"), concat(lit("Prospect#"), col("key"))).as("name"),
        (coalesce(col("acctbal"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("delta"), lit(0).cast("decimal(18,2)")))
          .cast("decimal(18,2)").cast("double").as("acctbal"),
        coalesce(col("segment"), lit("PROSPECT")).as("segment"),
        col("action"))
  }

  /** Incremental aggregation by partial merge — the pattern a 100 TB
    * warehouse maintains its rollups with: per-(type, day) PARTIAL
    * aggregates (the shape each daily batch writes once) merge into
    * per-type totals by re-aggregating the partials, never rescanning
    * history. Everything merged is algebraic — counts and sums add,
    * min/min and max/max compose — and the money column rides exact
    * integer cents (decimal(18,2) × 100 → long), so the merged result
    * is bit-identical to a direct pass over the raw events: the DuckDB
    * oracle computes the DIRECT aggregation, making the partial-merge
    * equivalence the thing the gate verifies. Mean is a single double
    * divide over exact longs, rounded to 6. Two narrow shuffles (day
    * partials, then the per-type merge — the second over |types|×|days|
    * rows, not |events|). */
  def aggIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = Tables.events(spark, sfDir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val daily = cents.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        min(col("cents")).as("mn"), max(col("cents")).as("mx"))
    daily.groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        count(lit(1)).as("n_days"),
        sum(col("s")).as("sum_cents"),
        min(col("mn")).as("min_cents"), max(col("mx")).as("max_cents"))
      .select(col("event_type"), col("n_events"), col("n_days"),
        (col("sum_cents").cast("double") / 100.0).as("total_value"),
        (col("min_cents").cast("double") / 100.0).as("min_value"),
        (col("max_cents").cast("double") / 100.0).as("max_value"),
        round(col("sum_cents").cast("double")
          / (col("n_events") * 100).cast("double"), 6).as("mean_value"))
  }

  /** RETRACTABLE incremental aggregation — the other half of the
    * incremental-view-maintenance story agg_incremental starts: that
    * operator merges APPEND-only partials; this one applies a change
    * feed containing DELETES by algebra, never rescanning history.
    * Counts and sums are retractable (signed deltas add), so
    *   new_rollup = old_rollup ⊕ Σ signed-delta-partials
    * — a union of signed partial rows re-aggregated, the exact shape a
    * streaming retract-mode sink maintains. Min/max are deliberately
    * absent: they are NOT retractable (a deleted minimum forces a
    * rescan), and the operator's surface documents that boundary.
    *
    * The feed derives deterministically from orders (delete every
    * 13th order; insert a marked twin of every 7th with 10% uplift in
    * exact decimal); the oracle computes the DIRECT aggregation over
    * (base ∖ deletes) ∪ inserts — the hash match proves the retraction
    * algebra. Two narrow shuffles: the signed-partial aggregate (rows =
    * |keys|, map-side combined) and nothing else corpus-sized. */
  def retractAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir).select(col("o_orderstatus").as("status"),
      col("o_orderkey"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val old = base.groupBy(col("status"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val deletes = base.filter(col("o_orderkey") % 13 === 0)
      .select(col("status"), lit(-1L).as("dn"), (-col("cents")).as("ds"))
    val inserts = base.filter(col("o_orderkey") % 7 === 0)
      .select(col("status"), lit(1L).as("dn"),
        // +10% uplift in exact integer cents: c + c div 10
        (col("cents") + expr("cents div 10")).as("ds"))
    val delta = deletes.unionByName(inserts)
      .groupBy(col("status")).agg(sum(col("dn")).as("dn"), sum(col("ds")).as("ds"))
    old.join(delta, Seq("status"), "full_outer")
      .select(col("status"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_rows"),
        ((coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).cast("double") / 100.0)
          .as("total"),
        round((coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).cast("double")
          / ((coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))) * 100L).cast("double"), 6)
          .as("mean"))
  }

  /** CDC log compaction: apply an ordered change stream (key, seq, op,
    * payload) to produce the current snapshot — latest-wins per key,
    * delete tombstones drop the key. This is the read-side of a CDC
    * lakehouse table (Debezium → Hudi/Delta shape): the log is derived
    * deterministically from orders (key = orderkey div 100 so every
    * key carries a multi-version history; seq = orderkey, unique; op =
    * D on every 17th change), and compaction is ONE map-side-combined
    * aggregation — max_by over the unique seq picks the latest version
    * without a sort or a window, so the shuffle carries one row per
    * KEY, not per version. The version count rides the same pass. */
  def cdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    val log = Tables.orders(spark, sfDir).select(
      expr("o_orderkey div 100").as("key"),
      col("o_orderkey").as("seq"),
      when(col("o_orderkey") % 17 === 0, lit("D")).otherwise(lit("U")).as("op"),
      col("o_orderstatus").as("status"),
      col("o_totalprice").cast("decimal(18,2)").as("price"))
    log.groupBy(col("key"))
      .agg(count(lit(1)).as("n_versions"),
        max(col("seq")).as("last_seq"),
        max_by(col("op"), col("seq")).as("last_op"),
        max_by(col("status"), col("seq")).as("last_status"),
        max_by(col("price"), col("seq")).as("last_price"))
      .filter(col("last_op") =!= "D")
      .select(col("key"), col("n_versions"), col("last_seq"),
        col("last_status").as("status"),
        col("last_price").cast("double").as("totalprice"))
  }

  /** Temporal dimension lookup: enrich every order with the SCD2
    * dimension version that was current at its order date — the as-of
    * join between a fact table and a versioned dimension that powers
    * "report as of the time it happened" semantics.
    *
    * Implementation is union-and-fill, not an interval join: dimension
    * version starts and fact probes union into one per-customer
    * timeline, a last-non-null window carries each version forward
    * onto the probes that follow it (version rows sort before probes
    * on the same date, so a same-day change applies to that day's
    * orders), and only probe rows survive. ONE shuffle on the customer
    * key; per-partition state is a customer's own history — bounded,
    * skew-safe, no row multiplication (an interval join would fan out
    * probes × versions before filtering). */
  def scd2Asof(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = scd2Dim(spark, sfDir)
      .select(col("custkey"), col("valid_from").as("d"), lit(0).as("is_probe"),
        col("version"), col("status"),
        lit(null).cast("long").as("orderkey"))
    val probes = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("custkey"), col("o_orderdate").as("d"),
        lit(1).as("is_probe"),
        lit(null).cast("long").as("version"), lit(null).cast("string").as("status"),
        col("o_orderkey").as("orderkey"))
    val w = Window.partitionBy(col("custkey"))
      .orderBy(col("d"), col("is_probe"), col("version"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dim.unionByName(probes)
      .withColumn("v_at", last(col("version"), ignoreNulls = true).over(w))
      .withColumn("s_at", last(col("status"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("orderkey"), col("custkey"), col("d").as("orderdate"),
        col("v_at").as("dim_version"), col("s_at").as("dim_status"))
  }

  /** SNAPSHOT DIFF — derive the changelog FROM two table versions
    * (the inverse of cdc_apply, which applies one): the lakehouse
    * primitive behind incremental-sync and audit ("what changed
    * between yesterday's snapshot and today's?") when the upstream
    * system ships full dumps instead of a change feed. v2 is a
    * deterministic md5 mutation of the orders snapshot (~5% deletes,
    * ~10% cents updates, ~5% inserts under fresh keys), and the diff
    * emits one row per changed key with the action and both payloads.
    *
    * Scale shape: ONE full-outer hash join on the key; the mutation
    * and the payload compare are row-local; unchanged keys (the vast
    * majority) are filtered before anything else moves. Cents ride
    * the exact decimal(18,2)·100 longs. */
  def snapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Similarity.md5Mod
    val p20 = graft.expressions.CrossHash.P / 20
    val p10 = graft.expressions.CrossHash.P / 10
    val v1 = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("key"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    // v2: drop ~5%, bump ~10% of cents by exactly +5% (integer div),
    // insert ~5% fresh keys derived from survivors
    val kept = v1.filter(md5Mod(concat(lit("del-"), col("key"))) >= p20)
    val mutated = kept.select(col("key"),
      when(md5Mod(concat(lit("upd-"), col("key"))) < p10,
        col("cents") + expr("cents div 20")).otherwise(col("cents")).as("cents"))
    val inserts = kept
      .filter(md5Mod(concat(lit("ins-"), col("key"))) < p20)
      .select((col("key") + 1000000000000L).as("key"), col("cents"))
    val v2 = mutated.unionByName(inserts)
    v1.select(col("key"), col("cents").as("old_cents"))
      .join(v2.select(col("key"), col("cents").as("new_cents")), Seq("key"), "full_outer")
      .withColumn("action",
        when(col("old_cents").isNull, lit("insert"))
          .when(col("new_cents").isNull, lit("delete"))
          .when(col("old_cents") =!= col("new_cents"), lit("update")))
      .filter(col("action").isNotNull)
      .select(col("key"), col("action"),
        (col("old_cents").cast("double") / 100.0).as("old_total"),
        (col("new_cents").cast("double") / 100.0).as("new_total"))
  }
}
