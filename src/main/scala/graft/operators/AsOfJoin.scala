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
  * form — tag both sides, union, and carry the right side's payload
  * forward with an ordered-window `last(ignoreNulls)`. One shuffle on
  * the key, O(n log n) in the partition sort, and skew splits under
  * AQE; the per-key candidate blow-up never materializes.
  */
object AsOfJoin {

  /** Generic as-of: attach to each `left` row the latest `right` row
    * (by tsCol, per keyCol) at or before it. Right payload columns
    * arrive as `asof_<name>`. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftTagged = left
      .withColumn("_src", lit(1))
      .withColumns(payloadCols.map(c => s"asof_$c" -> lit(null).cast(
        right.schema(c).dataType)).toMap)
    val rightTagged = right
      .select((Seq(col(keyCol), col(tsCol)) ++ payloadCols.map(c => col(c).as(s"asof_$c"))): _*)
      .withColumn("_src", lit(0))
    val unioned = leftTagged.select(
        (Seq(col(keyCol), col(tsCol), col("_src")) ++
          left.columns.filterNot(c => c == keyCol || c == tsCol).map(col) ++
          payloadCols.map(c => col(s"asof_$c"))): _*)
      .unionByName(rightTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal ts, so "at or before"
    // includes the simultaneous right row (ASOF >= semantics)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col("_src"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("_src") === 1).drop("_src")
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
        col("m.value").cast("decimal(18,2)").as("signup_val"))
    asOf(
      events.select(col("event_id"), col("user_id"), col("ts"), col("event_type")),
      signups, "user_id", "ts", Seq("signup_id", "signup_val"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("asof_signup_id").as("signup_event_id"),
        col("asof_signup_val").as("signup_value"))
  }
}
