package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles, DISTRIBUTED.
  *
  * Spark's built-in `percentile` aggregate is exact but merges every
  * partition's value→count map in the ONE final-agg task — fine at
  * test scale, but a single task holding the full distinct-value
  * census of a fact column is precisely the thing that OOMs at 100 TB
  * (l_orderkey alone is ~1.5M distinct at sf1 and grows linearly).
  * This is the same anti-pattern as a single-partition ntile window,
  * one level down.
  *
  * Distributed shape: (1) per-value counts — an ordinary map-side-
  * combined aggregate; (2) exclusive prefix counts in value order via
  * the two-phase range-rank (persist+count pins the sampled
  * boundaries — the vocab_growth rule); (3) each probe's bracketing
  * value pair found by a range-condition join against a BROADCAST
  * probe table (statically bounded: a literal-grid posexplode over the
  * one-row total); (4) Spark Percentile's interpolation formula
  * replicated exactly — `lower==higher ? lowerValue :
  * lowerValue·(higher−position) + higherValue·(position−lower)` with
  * position = p·(N−1) in double — so results are bit-identical to the
  * built-in (and therefore to the DuckDB oracle the gate certifies).
  */
object ExactQuantile {

  /** Dispatch threshold: below this row count a
    * value census trivially fits one task AND the built-in's single
    * merge beats the rank pipeline's multi-job overhead (measured at
    * sf0.1: built-in 0.8s vs distributed 3.4s for q_quantiles);
    * at/above it the distributed path is already faster (sf1: 4.0s vs
    * 5.7s) and is the only shape that survives unbounded growth. */
  final val DistributedThresholdRows = 5000000L

  /** One row: `qs` = array of exact percentiles of `df.c` (cast to
    * double) at `probes`, in probe order. Above the size threshold the
    * result is eagerly materialized (localCheckpoint) so the rank
    * table's pinned boundaries can be released before the caller
    * composes further; both paths produce bit-identical doubles.
    *
    * `knownRowsUpper`: an UPPER BOUND on `df`'s row count the caller
    * already holds (a persisted-table count, a parent-table count for
    * a filtered df). Dispatch only needs a bound — an over-estimate
    * merely sends a small input down the distributed path (correct,
    * slower), never the reverse at meaningful scale. Passing it skips
    * the per-call `df.count()` probe job (a caller profiling three
    * columns of one table would otherwise pay three redundant counts). */
  def percentilesOf(df: DataFrame, c: String, probes: Seq[Double],
      knownRowsUpper: Long = -1L): DataFrame = {
    // metadata-scale probe (parquet count pushdown on an unfiltered df)
    val bound = if (knownRowsUpper >= 0L) knownRowsUpper else df.count()
    if (bound < DistributedThresholdRows)
      df.agg(percentile(col(c).cast("double"),
        array(probes.map(lit(_)): _*)).as("qs"))
    else distributedPercentiles(df, c, probes)
  }

  /** Multi-column twin of [[percentilesOf]]: ONE fact scan and ONE
    * rank pipeline for every column — a caller profiling k columns of
    * the same table through k single-column calls pays k full scans
    * plus k pipelines' worth of job overhead, the difference a 100 TB
    * scan cannot absorb. Returns one row per column:
    * (column_name, qs), qs in probe order, doubles bit-identical to
    * the single-column path (the per-(column, value) census, prefix
    * ranks, and interpolation are the same formulas keyed by column).
    * Dispatch below the size threshold is likewise one scan: a single
    * aggregate computing every column's built-in percentile. */
  def percentilesOfMulti(df: DataFrame, cols: Seq[String], probes: Seq[Double],
      knownRowsUpper: Long = -1L): DataFrame = {
    val bound = if (knownRowsUpper >= 0L) knownRowsUpper else df.count()
    if (bound < DistributedThresholdRows) {
      val aggs = cols.map(c => percentile(col(c).cast("double"),
        array(probes.map(lit(_)): _*)).as(s"qs_$c"))
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(cols.map(c =>
          struct(lit(c).as("column_name"), col(s"qs_$c").as("qs"))): _*)).as("s"))
        .select(col("s.column_name"), col("s.qs"))
    } else distributedPercentilesMulti(df, cols, probes)
  }

  private[graft] def distributedPercentilesMulti(
      df: DataFrame, cols: Seq[String], probes: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // one scan: (column, value) pairs via a generator, then the
    // map-side-combined per-(column, value) census
    val kv = df.select(explode(map(cols.flatMap(c =>
        Seq(lit(c), col(c).cast("double"))): _*)).as(Seq("k", "v")))
      .filter(col("v").isNotNull)
    // the census persists BEFORE the range exchange: RangePartitioner
    // samples its child plan in a separate pass, which would otherwise
    // re-execute the full scan+explode+aggregate a second time — the
    // sample then reads the cached census (distinct-value-sized)
    val cnt = kv.groupBy(col("k"), col("v")).agg(count(lit(1)).as("c"))
      .persist()
    val parted = cnt.repartitionByRange(n, col("k"), col("v"))
      .withColumn("pid", spark_partition_id())
      .persist()
    parted.count()
    cnt.unpersist()
    // exclusive prefix per column: in-partition running sum + per-
    // (column, partition) offsets (a column may span partitions and a
    // partition may hold several columns — both handled by keying the
    // offset table on (k, pid))
    val local = parted.withColumn("lc", coalesce(sum(col("c")).over(
      Window.partitionBy(col("k"), col("pid")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offs = parted.groupBy(col("k"), col("pid")).agg(sum(col("c")).as("pc"))
      .withColumn("poff", coalesce(sum(col("pc")).over(
        Window.partitionBy(col("k")).orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("k"), col("pid"), col("poff"))
    val ranked = local.join(offs, Seq("k", "pid"))
      .select(col("k"), col("v"), col("c"), (col("lc") + col("poff")).as("e"))
    val probeRows = parted.groupBy(col("k")).agg(sum(col("c")).as("n_total"))
      .select(col("k").as("pk"), col("n_total"),
        posexplode(array(probes.map(lit(_)): _*)).as(Seq("idx", "p")))
      .withColumn("pos", col("p") * (col("n_total") - 1).cast("double"))
      .withColumn("flo", floor(col("pos")).cast("long"))
      .withColumn("fhi", ceil(col("pos")).cast("long"))
    val matched = ranked.join(broadcast(probeRows),
      col("k") === col("pk") &&
        col("e") <= col("fhi") && col("flo") < col("e") + col("c"))
    val perProbe = matched.groupBy(col("k"), col("idx"))
      .agg(max(col("pos")).as("pos"),
        max(col("flo")).as("flo"), max(col("fhi")).as("fhi"),
        max(when(col("e") <= col("flo") && col("flo") < col("e") + col("c"),
          col("v"))).as("lv"),
        max(when(col("e") <= col("fhi") && col("fhi") < col("e") + col("c"),
          col("v"))).as("hv"))
      .withColumn("q",
        when(col("flo") === col("fhi"), col("lv"))
          .otherwise(col("lv") * (col("fhi").cast("double") - col("pos")) +
            col("hv") * (col("pos") - col("flo").cast("double"))))
    val out = perProbe
      .groupBy(col("k").as("column_name"))
      .agg(sort_array(collect_list(struct(col("idx"), col("q")))).as("s"))
      .select(col("column_name"),
        transform(col("s"), x => x.getField("q")).as("qs"))
      .localCheckpoint()
    parted.unpersist()
    out
  }

  private[graft] def distributedPercentiles(
      df: DataFrame, c: String, probes: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // census persisted before the range exchange: RangePartitioner's
    // sample pass would otherwise re-execute the full scan+aggregate
    val cnt = df.select(col(c).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .persist()
    val parted = cnt.repartitionByRange(n, col("v"))
      .withColumn("pid", spark_partition_id())
      .persist()
    parted.count()
    cnt.unpersist()
    val local = parted.withColumn("lc", coalesce(sum(col("c")).over(
      Window.partitionBy(col("pid")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offs = parted.groupBy(col("pid")).agg(sum(col("c")).as("pc"))
      .withColumn("poff", coalesce(sum(col("pc")).over(
        Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("poff"))
    // e = exclusive prefix: value row covers multiset indices [e, e+c-1]
    val ranked = local.join(offs, Seq("pid"))
      .select(col("v"), col("c"), (col("lc") + col("poff")).as("e"))
    val probeRows = parted.agg(sum(col("c")).as("n_total"))
      .select(col("n_total"),
        posexplode(array(probes.map(lit(_)): _*)).as(Seq("idx", "p")))
      .withColumn("pos", col("p") * (col("n_total") - 1).cast("double"))
      .withColumn("flo", floor(col("pos")).cast("long"))
      .withColumn("fhi", ceil(col("pos")).cast("long"))
    // 1-2 value rows per probe: the ones covering index flo and/or fhi
    val matched = ranked.join(broadcast(probeRows),
      col("e") <= col("fhi") && col("flo") < col("e") + col("c"))
    val perProbe = matched.groupBy(col("idx"))
      .agg(max(col("pos")).as("pos"),
        max(col("flo")).as("flo"), max(col("fhi")).as("fhi"),
        max(when(col("e") <= col("flo") && col("flo") < col("e") + col("c"),
          col("v"))).as("lv"),
        max(when(col("e") <= col("fhi") && col("fhi") < col("e") + col("c"),
          col("v"))).as("hv"))
      .withColumn("q",
        when(col("flo") === col("fhi"), col("lv"))
          .otherwise(col("lv") * (col("fhi").cast("double") - col("pos")) +
            col("hv") * (col("pos") - col("flo").cast("double"))))
    val out = perProbe
      .groupBy()
      .agg(sort_array(collect_list(struct(col("idx"), col("q")))).as("s"))
      .select(transform(col("s"), x => x.getField("q")).as("qs"))
      .localCheckpoint()
    parted.unpersist()
    out
  }
}
