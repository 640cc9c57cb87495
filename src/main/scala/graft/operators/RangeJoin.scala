package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Banded range join — the interval predicate Spark only plans as a
  * per-key nested loop: pairs with `0 < b.ts - a.ts <= width` per key.
  *
  * Spark-first shape: quantize time into width-sized buckets, explode
  * the left side into its own and the next bucket, equi-join on
  * (key, bucket), and apply the exact range filter to the candidates.
  * Any qualifying pair is at most one bucket apart, so the equi-join
  * finds it exactly once — candidate volume is O(rows × density of one
  * band), not O(rows² per key), and it shuffles/scales like any hash
  * join.
  */
object RangeJoin {

  /** Event pairs from the same user at most `widthSec` apart (strictly
    * after, so no self-pairs), with the exact gap. */
  def bandJoin(events: DataFrame, widthSec: Long): DataFrame = {
    val widthUs = widthSec * 1000000L
    val ev = events.select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val a = ev.select(col("event_id").as("a_id"), col("user_id"),
        col("event_type").as("a_type"), col("us").as("a_us"))
      .withColumn("bucket",
        explode(array(floor(col("a_us") / widthUs), floor(col("a_us") / widthUs) + 1)))
    val b = ev.select(col("event_id").as("b_id"), col("user_id"),
        col("event_type").as("b_type"), col("us").as("b_us"))
      .withColumn("bucket", floor(col("b_us") / widthUs))
    a.join(b, Seq("user_id", "bucket"))
      .filter(col("b_us") > col("a_us") && col("b_us") <= col("a_us") + widthUs)
      .select(col("a_id"), col("b_id"), col("user_id"),
        col("a_type"), col("b_type"), (col("b_us") - col("a_us")).as("gap_us"))
  }

  def eventsRange(spark: SparkSession, sfDir: String): DataFrame =
    bandJoin(Tables.events(spark, sfDir), widthSec = 300)
}
