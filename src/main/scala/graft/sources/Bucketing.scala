package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: pre-shuffle a table ONCE at write time so
  * every later equi-join/aggregation on the bucket key runs with no
  * exchange at all. The 100 TB lever for fact-fact joins that repeat
  * every pipeline run (orders⋈customer, lineitem⋈orders): the shuffle
  * cost moves from every query to a single write.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted table (registered in the session
    * catalog, files under the session's warehouse dir). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With equal bucket
    * counts the planner proves co-partitioning: sort-merge join, zero
    * Exchange (PlanSpec asserts it). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    // hint forces SMJ so the demo is not silently broadcast
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
