package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared partitioning idioms for the operator library (and the
  * query layer's per-row-heavy reference ops). */
private[graft] object Partitioning {
  /** Spread a narrow input across the session's shuffle-partition
    * count before a wide per-row stage (similarity scoring, hashing):
    * the single-file test inputs arrive as one row group, which would
    * otherwise run the expensive stage single-task. A no-op cost at
    * cluster scale, where the scan already yields many splits. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
}
