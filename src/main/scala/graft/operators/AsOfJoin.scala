package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** As-of join — the temporal operator Spark's built-ins don't express:
  * for each left row, the single right row with the greatest timestamp
  * ≤ the left's, per key.
  *
  * Spark-first shape: NOT a range join (whose candidate set is
  * O(left × right per key) before pruning) but the union-and-fill
  * form — tag both sides, union, and carry the latest right row
  * forward as ONE struct with an ordered-window `last(ignoreNulls)`.
  * One shuffle on the key, O(n log n) in the partition sort; the
  * per-key candidate blow-up never materializes. (A key hot enough to
  * swamp one window task needs a coarser key or time-chunked salting —
  * window partitions, unlike joins, are not split by AQE.)
  */
object AsOfJoin {

  /** Generic as-of: attach to each `left` row the latest `right` row
    * (by tsCol, per keyCol) at or before it. Right payload columns
    * arrive as `asof_<name>`. The payload travels as one struct, so
    * the output is always a genuine right row — never a per-column
    * mix of different rows when some payload values are null. Ties
    * among right rows at the same (key, ts) resolve by a content hash:
    * arbitrary but stable across runs. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val reserved = "_src" +: "_asof_payload" +: payloadCols.map(c => s"asof_$c")
    reserved.foreach(r => require(!left.columns.contains(r),
      s"asOf reserves column name '$r'; rename it on the left side first"))

    val payloadStruct = struct(payloadCols.map(col): _*)
    val leftTagged = left
      .withColumn("_src", lit(1))
      .withColumn("_asof_payload",
        lit(null).cast(right.select(payloadStruct).schema.head.dataType))
    val rightTagged = right
      .select(col(keyCol), col(tsCol), payloadStruct.as("_asof_payload"))
      .withColumn("_src", lit(0))
    val unioned = leftTagged
      .unionByName(rightTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal ts, so "at or before"
    // includes the simultaneous right row (ASOF >= semantics)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_src"), xxhash64(col("_asof_payload")))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn("_asof_payload",
      last(col("_asof_payload"), ignoreNulls = true).over(w))
    payloadCols.foldLeft(filled.filter(col("_src") === 1)) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"_asof_payload.$c"))
    }.drop("_src", "_asof_payload")
  }

  /** Nearest-as-of (pandas merge_asof direction='nearest'): for each
    * left row, the right row minimizing |Δts| per key — before OR
    * after — with ties going to the earlier (backward) row, the
    * merge_asof rule. Same union-and-fill machinery as asOf, but BOTH
    * directions fill from ONE partition sort: the backward candidate
    * via `last(ignoreNulls)` over an unbounded-preceding frame and the
    * forward candidate via `first(ignoreNulls)` over an
    * unbounded-following frame share the window's (key, ts) sort, so
    * the operator still costs one shuffle + one sort — the per-key
    * candidate blow-up of a |Δt| range join never materializes. The
    * right ts rides inside the payload struct; the pick is a row-local
    * integer-micros comparison. */
  def asOfNearest(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val reserved = "_src" +: "_prev" +: "_next" +: "_pick" +:
      s"asof_$tsCol" +: payloadCols.map(c => s"asof_$c")
    reserved.foreach(r => require(!left.columns.contains(r),
      s"asOfNearest reserves column name '$r'; rename it on the left side first"))

    val payloadStruct = struct((tsCol +: payloadCols).map(col): _*)
    val leftTagged = left
      .withColumn("_src", lit(1))
      .withColumn("_prev",
        lit(null).cast(right.select(payloadStruct).schema.head.dataType))
    val rightTagged = right
      .select(col(keyCol), col(tsCol), payloadStruct.as("_prev"))
      .withColumn("_src", lit(0))
    val unioned = leftTagged
      .unionByName(rightTagged, allowMissingColumns = true)
    val order = Seq(col(tsCol), col("_src"), xxhash64(col("_prev")))
    val wBack = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wFwd = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(0, Window.unboundedFollowing)
    val filled = unioned
      .withColumn("_next", first(col("_prev"), ignoreNulls = true).over(wFwd))
      .withColumn("_prev", last(col("_prev"), ignoreNulls = true).over(wBack))
      .filter(col("_src") === 1)
    // nearest pick in exact integer micros; tie → backward (merge_asof)
    val dPrev = unix_micros(col(tsCol)) - unix_micros(col(s"_prev.$tsCol"))
    val dNext = unix_micros(col(s"_next.$tsCol")) - unix_micros(col(tsCol))
    val picked = filled.withColumn("_pick",
      when(col("_prev").isNull, col("_next"))
        .when(col("_next").isNull, col("_prev"))
        .when(dPrev <= dNext, col("_prev"))
        .otherwise(col("_next")))
    (tsCol +: payloadCols).foldLeft(picked) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"_pick.$c"))
    }.drop("_src", "_prev", "_next", "_pick")
  }

  /** Query binding: every event joined to the same user's NEAREST
    * 'signup' event in time, before or after — the enrichment shape
    * when attribution may precede the reference event (a purchase
    * logged moments before its signup record lands). dt_us is signed:
    * positive = the signup preceded the event. */
  def eventsAsofNearest(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val signups = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("signup_id"))
    asOfNearest(
      events.select(col("event_id"), col("user_id"), col("ts"), col("event_type")),
      signups, "user_id", "ts", Seq("signup_id"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("asof_signup_id").as("signup_event_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("dt_us"))
  }

  /** Query binding: every event joined to the same user's most recent
    * prior (or simultaneous) 'signup' event — the attribution shape
    * (which signup does this action trace back to?). The right side is
    * deduped per (user, ts) first so ties resolve deterministically on
    * both engines. */
  def eventsAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir)
    val signups = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(struct(col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("ts"),
        col("m.event_id").as("signup_id"),
        col("m.value").as("signup_val"))
    asOf(
      events.select(col("event_id"), col("user_id"), col("ts"), col("event_type")),
      signups, "user_id", "ts", Seq("signup_id", "signup_val"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("asof_signup_id").as("signup_event_id"),
        col("asof_signup_val").as("signup_value"))
  }
}
