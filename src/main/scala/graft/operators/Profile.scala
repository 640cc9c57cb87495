package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-profiling operator: the table-health snapshot every pipeline
  * runs before trusting an input drop (row counts, null counts, exact
  * distinct cardinality, value range, checksum-style sum).
  *
  * One narrow scan per profiled column — column pruning means each
  * pass reads ONE parquet column chunk, so the passes are independent
  * and embarrassingly parallel; a single-pass multi-distinct
  * formulation would instead Expand the scan N× and shuffle the
  * whole row. At 100 TB the per-column pass over a columnar file is
  * the cheaper and more elastic plan (and is what e.g. Deequ-style
  * profilers generate). Exact count_distinct is the gate form; the
  * library also exposes the HLL path (approxProfile) for the
  * trillions-of-rows regime where a 2% ndv error is the right trade.
  */
object Profile {

  private val profiled = Seq("l_orderkey", "l_partkey", "l_suppkey")

  private def one(df: DataFrame, c: String): DataFrame =
    df.select(col(c))
      .agg(
        count(lit(1)).as("n_rows"),
        count(lit(1)).minus(count(col(c))).as("n_null"),
        count_distinct(col(c)).as("ndv"),
        min(col(c)).cast("long").as("min_v"),
        max(col(c)).cast("long").as("max_v"),
        sum(col(c)).cast("long").as("sum_v"))
      .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
        col("ndv"), col("min_v"), col("max_v"), col("sum_v"))

  /** Exact profile of the lineitem key columns, one output row per
    * column. */
  def colProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    profiled.map(one(li, _)).reduce(_ unionByName _)
  }

  /** Scale path: single pass, approximate ndv (HyperLogLog++), no
    * Expand — the form a 100 TB profile job actually runs. Not gate-
    * checked (approx by construction); parity with the exact form is
    * asserted in ProfileSpec within HLL tolerance. */
  /** The enumerated language classes (the strata the corpus declares);
    * anything else folds into an explicit "other" bucket. */
  val balanceLangs: Seq[String] = Seq("en", "de", "es", "fr", "zh")

  /** Class-balance profile per source: language counts, Shannon
    * entropy and Gini impurity of each source's language mix — the
    * check a mixture pipeline runs before/after re-weighting.
    *
    * One shuffle: language counts pivot into fixed conditional-agg
    * columns (no second pass, no distinct-collect), and entropy/gini
    * evaluate as FIXED-ORDER sums over the enumerated classes — a
    * float aggregation over a dynamic lang set would be
    * merge-order-dependent and unhashable cross-engine. */
  def classBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val aggs = balanceLangs.map(l =>
      sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"n_$l"))
    val base = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
      .withColumn("n_other",
        col("n_docs") - balanceLangs.map(l => col(s"n_$l")).reduce(_ + _))
    val classes = balanceLangs.map(l => col(s"n_$l")) :+ col("n_other")
    def p(c: org.apache.spark.sql.Column) = c.cast("double") / col("n_docs").cast("double")
    val entropy = classes.map(c =>
      when(c > 0, -p(c) * log(p(c))).otherwise(lit(0.0))).reduce(_ + _)
    val gini = lit(1.0) - classes.map(c => p(c) * p(c)).reduce(_ + _)
    base.select(
      (Seq(col("source"), col("n_docs")) ++
        balanceLangs.map(l => col(s"n_$l")) :+ col("n_other") :+
        round(entropy, 6).as("entropy") :+ round(gini, 6).as("gini")): _*)
  }

  /** Fixed-width value histogram per event type — the profiling
    * companion every distribution check needs before picking filter
    * thresholds. Bin = floor(cents / width) over exact integer cents,
    * so bin assignment is engine-independent (a double divide would
    * waver on bin edges); one shuffle on (type, bin), output is
    * |types|×|bins| rows. Empty bins are absent by design — a dense
    * grid would be the gapfill pattern. */
  def valueHistogram(spark: SparkSession, sfDir: String, binWidth: Long = 5000): DataFrame =
    Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"),
        floor(col("cents") / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        (min(col("cents")).cast("double") / 100.0).as("bin_min"),
        (max(col("cents")).cast("double") / 100.0).as("bin_max"))
      .withColumn("bin_lo", (col("bin") * binWidth).cast("double") / 100.0)

  /** Equi-height buckets per profiled column. */
  final val EqBuckets = 8

  /** EQUI-HEIGHT histogram of the lineitem key columns — the
    * optimizer-statistics twin of valueHistogram's equi-width form:
    * bucket boundaries are the exact interpolated octile points
    * (binary-fraction probes, so the interpolation is exact in double
    * in both engines — the q_quantiles discipline), and each bucket
    * reports its (lo, hi] population. Selectivity estimation wants
    * equal-mass buckets; value profiling wants equal-width bins; a
    * warehouse keeps both.
    *
    * Per column: one percentile aggregate (9 probes), the 1-row
    * boundary array broadcast onto a second narrow scan, and ONE
    * conditional-aggregate pass assigning all 8 buckets — no
    * per-bucket scans, no join fan-out. Boundary ties collapse
    * deterministically to the lowest bucket whose hi equals the value
    * (strict > lo, inclusive <= hi; bucket 1 additionally owns the
    * minimum), and empty buckets still emit with n = 0. */
  /** TABLE-PROFILE DRIFT: the order table's summary statistics on the
    * two halves of its time range, as before/after/relative-delta rows
    * — the schema-level companion of psi_drift's value-distribution
    * monitor (a silently shifted mean, collapsed NDV, or volume drop
    * is the first symptom of an upstream break). The split is the
    * exact integer temporal midpoint (psi_drift's rule); every metric
    * is an exact long (counts, cent sums, NDV) or one fixed divide,
    * so the whole profile comes from ONE conditional-aggregate pass
    * (NDVs via two count-distincts in the same aggregate). */
  def profileDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      // o_orderdate arrives TIMESTAMP_NTZ; the NTZ→LTZ cast is
      // value-preserving under the UTC session TZ (Tables.events note)
      .select(unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val mid = ord.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
      .select(expr("(mn + mx) div 2").as("mid"))
    val m = ord.crossJoin(broadcast(mid))
      .withColumn("p", when(col("us") < col("mid"), 0).otherwise(1))
      .agg(
        sum(when(col("p") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("p") === 1, 1L).otherwise(0L)).as("n2"),
        sum(when(col("p") === 0, col("cents")).otherwise(0L)).as("c1"),
        sum(when(col("p") === 1, col("cents")).otherwise(0L)).as("c2"),
        count_distinct(when(col("p") === 0, col("o_custkey"))).as("u1"),
        count_distinct(when(col("p") === 1, col("o_custkey"))).as("u2"),
        max(when(col("p") === 0, col("cents"))).as("x1"),
        max(when(col("p") === 1, col("cents"))).as("x2"))
    m.select(explode(array(
        struct(lit("n_orders").as("metric"),
          col("n1").cast("double").as("before"), col("n2").cast("double").as("after")),
        struct(lit("mean_price").as("metric"),
          (col("c1").cast("double") / col("n1").cast("double") / 100.0).as("before"),
          (col("c2").cast("double") / col("n2").cast("double") / 100.0).as("after")),
        struct(lit("n_customers").as("metric"),
          col("u1").cast("double").as("before"), col("u2").cast("double").as("after")),
        struct(lit("max_price").as("metric"),
          (col("x1").cast("double") / 100.0).as("before"),
          (col("x2").cast("double") / 100.0).as("after")))).as("r"))
      .select(col("r.metric"), round(col("r.before"), 6).as("before"),
        round(col("r.after"), 6).as("after"),
        round(when(col("r.before") =!= 0.0,
          (col("r.after") - col("r.before")) / col("r.before")), 6).as("rel_delta"))
  }

  def histogramEquiHeight(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val probes = (0 to EqBuckets).map(_.toDouble / EqBuckets)
    if (ExactQuantile.useDistributed(li)) {
      // TWO fact scans total for boundaries AND populations: the
      // bracket-refinement pipeline's cums column (count ≤ each
      // boundary) already IS the cumulative histogram, so bucket
      // populations are adjacent differences — the conditional-sum
      // cell pass the small path pays below is pure re-derivation of
      // information the refinement held. Bucket semantics replicated
      // exactly: bucket b owns (q(b-1), q(b)], bucket 1 additionally
      // owns v == q(0) = min, so n_1 = cums(1) and n_b = cums(b) −
      // cums(b−1) — duplicate boundaries leave the same empty buckets
      // the conditional sums produce.
      ExactQuantile.percentilesWithCumsOfMulti(li, profiled, probes)
        .select(col("column_name"), explode(array((1 to EqBuckets).map(b =>
          struct(lit(b.toLong).as("bucket"),
            col("qs")(b - 1).as("lo"), col("qs")(b).as("hi"),
            (if (b == 1) col("cums")(b)
             else col("cums")(b) - col("cums")(b - 1)).as("n"))): _*)).as("r"))
        .select(col("column_name"), col("r.bucket"),
          col("r.lo"), col("r.hi"), col("r.n"))
    } else {
      // below the dispatch threshold: one built-in boundary pass, one
      // conditional-sum cell pass against the broadcast boundary row
      // (cheap at this size); limit(1) restores the static one-row
      // bound for the non-equi join guard
      val q = ExactQuantile.percentilesOfMulti(li, profiled, probes,
          knownRowsUpper = 0L)
        .groupBy()
        .agg(max(when(col("column_name") === profiled.head, col("qs")))
            .as(s"qs_${profiled.head}"),
          profiled.tail.map(c => max(when(col("column_name") === c, col("qs")))
            .as(s"qs_$c")): _*)
        .limit(1)
      val cells: Seq[Column] = profiled.flatMap { c =>
        (1 to EqBuckets).map { b =>
          val qs = col(s"qs_$c")
          val inRange = col(c) > qs(b - 1) && col(c) <= qs(b)
          val owns = if (b == 1) inRange || col(c) === qs(0) else inRange
          sum(when(owns, 1L).otherwise(0L)).as(s"n_${c}_$b")
        }
      }
      val qsCarry: Seq[Column] = profiled.map(c => first(col(s"qs_$c")).as(s"qs_$c"))
      li.select(profiled.map(col): _*).crossJoin(broadcast(q))
        .agg((cells ++ qsCarry).head, (cells ++ qsCarry).tail: _*)
        .select(explode(array(profiled.flatMap(c => (1 to EqBuckets).map(b =>
          struct(lit(c).as("column_name"), lit(b.toLong).as("bucket"),
            col(s"qs_$c")(b - 1).as("lo"), col(s"qs_$c")(b).as("hi"),
            col(s"n_${c}_$b").as("n")))): _*)).as("r"))
        .select(col("r.column_name").as("column_name"), col("r.bucket"),
          col("r.lo"), col("r.hi"), col("r.n"))
    }
  }

  def approxProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val aggs: Seq[Column] = profiled.flatMap(c => Seq(
      count(col(c)).as(s"count_$c"),
      approx_count_distinct(col(c)).as(s"ndv_$c"),
      min(col(c)).cast("long").as(s"min_$c"),
      max(col(c)).cast("long").as(s"max_$c")))
    li.agg(aggs.head, aggs.tail: _*)
  }

  /** K-ANONYMITY audit over the customer quasi-identifiers
    * (nation, market segment, $1000 balance bucket) — the governance
    * gate a release pipeline runs before publishing row-level data
    * beside dp_release's aggregate path: every row's group size k
    * under the QI projection, banded into the re-identification risk
    * tiers privacy review actually reads (k=1 unique, 2-4, 5-9,
    * 10-19, 20+), with group counts, row mass, and row share per
    * tier.
    *
    * Money floats ride the events_heatmap cents discipline
    * (decimal(18,2)·100 → exact long); the $1000 bucket is
    * floor(cents/1e5) in ONE IEEE divide so truncation-vs-floor
    * dialect differences on negative balances cannot diverge. Scale
    * shape: one map-side-combined shuffle onto the QI grid, then
    * band aggs over the group-sized table and a 1-row total
    * broadcast — the corpus is touched once. */
  /** l-diversity — k_anonymity's sensitive-attribute companion: a
    * quasi-identifier group can satisfy k and still leak when every
    * member shares one sensitive value (the homogeneity attack), so
    * the release test is l = DISTINCT sensitive values per QI group.
    * Here QI = (nation, balance bucket), sensitive = market segment
    * (deliberately NOT in the QI, unlike kAnonymity's grouping).
    * Output is the l-histogram with row shares — the l=1 row counts
    * exactly the records a homogeneous group would expose. Two
    * aggregations (QI census with distinct-sensitive, then the tiny
    * l rollup) — the census shuffles once on the QI key. */
  def lDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    // $100 buckets (vs kAnonymity's $1000): groups must stay small
    // enough that l varies at every SF, or the histogram degenerates
    // to one all-diverse row
    val groups = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        floor(cents / lit(10000.0)).cast("long").as("bal_bucket"))
      .groupBy(col("nation"), col("bal_bucket"))
      .agg(count(lit(1)).as("k"), count_distinct(col("segment")).as("l"))
    val total = groups.agg(sum(col("k")).as("n_total"))
    groups.groupBy(col("l"))
      .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
      .crossJoin(broadcast(total))
      .select(col("l"), col("n_groups"), col("n_rows"),
        round(col("n_rows").cast("double") / col("n_total").cast("double"), 6)
          .as("rows_share"))
  }

  def kAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    val groups = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"),
        floor(cents / lit(100000.0)).cast("long").as("bal_bucket"))
      .groupBy(col("nation"), col("segment"), col("bal_bucket"))
      .agg(count(lit(1)).as("k"))
    val total = groups.agg(sum(col("k")).as("n_total"))
    groups
      .withColumn("band_lo",
        when(col("k") === 1, 1L).when(col("k") <= 4, 2L)
          .when(col("k") <= 9, 5L).when(col("k") <= 19, 10L).otherwise(20L))
      .groupBy(col("band_lo"))
      .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
      .crossJoin(broadcast(total))
      .select(col("band_lo"),
        when(col("band_lo") === 1L, "1").when(col("band_lo") === 2L, "2-4")
          .when(col("band_lo") === 5L, "5-9").when(col("band_lo") === 10L, "10-19")
          .otherwise("20+").as("k_band"),
        col("n_groups"), col("n_rows"),
        round(col("n_rows").cast("double") / col("n_total").cast("double"), 6)
          .as("rows_share"))
  }
}
