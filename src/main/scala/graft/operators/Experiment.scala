package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Similarity
import graft.sources.Tables

/** Experimentation & monitoring analytics: A/B test evaluation,
  * distribution-drift detection (PSI), and conversion-latency
  * profiling — the measurement layer that sits on top of the event
  * pipeline. All statistics derive from exact integer counts through
  * fixed expression orders, so both engines emit bit-identical doubles
  * (rounded to 6 where a transcendental is involved).
  */
object Experiment {

  /** A/B test readout: users are hashed into two variants (md5 —
    * deterministic, balanced, assignment independent of behavior) and
    * compared on revenue-per-user with the Welch two-sample z-test —
    * the continuous-metric form (a proportion test degenerates when a
    * dense event stream converts every user; revenue always varies).
    *
    * One user-keyed aggregation shuffle (revenue cents, exact longs),
    * then a single-row moment fold: per-variant n, Σx as longs and Σx²
    * in decimal(38,0) (four rows wide — free), variances via the exact
    * closed form, z in one fixed float expression rounded to 6. A
    * degenerate zero standard error reports z = 0 explicitly rather
    * than dividing by zero. */
  def abTest(spark: SparkSession, sfDir: String): DataFrame = {
    val users = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
          (col("value").cast("decimal(18,2)") * 100).cast("long")).otherwise(0L))
        .as("cents"))
      .withColumn("variant",
        pmod(Similarity.md5Mod(concat(lit("ab-"), col("user_id"))), lit(2L)))
    val m = users.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === 0, col("cents")).otherwise(0L)).as("s_a"),
      sum(when(col("variant") === 0,
        col("cents").cast("decimal(38,0)") * col("cents")).otherwise(lit(0).cast("decimal(38,0)"))).as("q_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("variant") === 1, col("cents")).otherwise(0L)).as("s_b"),
      sum(when(col("variant") === 1,
        col("cents").cast("decimal(38,0)") * col("cents")).otherwise(lit(0).cast("decimal(38,0)"))).as("q_b"))
    m.select(col("n_a"), col("n_b"),
        round(col("s_a").cast("double") / col("n_a").cast("double") / 100.0, 6).as("mean_a"),
        round(col("s_b").cast("double") / col("n_b").cast("double") / 100.0, 6).as("mean_b"),
        // Welch z over exact moments: var = (n·Σx² − (Σx)²)/(n·(n−1))
        round(
          when(
            (col("n_a").cast("decimal(38,0)") * col("q_a") -
              col("s_a").cast("decimal(38,0)") * col("s_a")).cast("double") > 0 ||
            (col("n_b").cast("decimal(38,0)") * col("q_b") -
              col("s_b").cast("decimal(38,0)") * col("s_b")).cast("double") > 0,
            (col("s_b").cast("double") / col("n_b").cast("double") -
              col("s_a").cast("double") / col("n_a").cast("double")) /
              sqrt(
                (col("n_a").cast("decimal(38,0)") * col("q_a") -
                  col("s_a").cast("decimal(38,0)") * col("s_a")).cast("double") /
                  (col("n_a").cast("double") * (col("n_a") - 1).cast("double")) /
                  col("n_a").cast("double") +
                (col("n_b").cast("decimal(38,0)") * col("q_b") -
                  col("s_b").cast("decimal(38,0)") * col("s_b")).cast("double") /
                  (col("n_b").cast("double") * (col("n_b") - 1).cast("double")) /
                  col("n_b").cast("double")))
            .otherwise(lit(0.0)),
          6).as("z_score"))
  }

  /** PSI bin width (cents) and count — the value_histogram grid,
    * clamped to a fixed spine so the index is well-defined. */
  final val PsiBinW = 5000L
  final val PsiBins = 20

  /** Population-stability-index drift monitor: split the event stream
    * at its temporal midpoint (exact integer micros), histogram the
    * money value per event type over a FIXED 20-bin spine on both
    * sides, and report PSI = Σ (p−q)·ln(p/q) with +1 Laplace smoothing
    * — the standard "did this metric's distribution move" check a
    * model-monitoring pipeline runs per feature.
    *
    * Determinism: bin counts are exact longs on a literal spine
    * (missing bins materialize via the types×bins frame, so smoothing
    * sees the same zeros on both engines); each bin's term is one
    * fixed float expression, and the 20-term sum folds in bin order
    * (sorted collect — the house float-sum discipline), rounded to 6.
    * Scale shape: one corpus aggregation onto types×bins cells
    * (map-side combined, mergeable), then cell-level arithmetic. */
  def psiDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        unix_micros(col("ts")).as("us"))
    val mid = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
      .select(expr("(mn + mx) div 2").as("mid"))
    val cells = ev.crossJoin(broadcast(mid))
      .select(col("event_type"),
        when(col("us") < col("mid"), lit(0)).otherwise(lit(1)).as("period"),
        least(greatest(expr(s"cents div $PsiBinW"), lit(0L)), lit(PsiBins - 1L)).as("bin"))
      .groupBy(col("event_type"), col("period"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val spine = cells.select(col("event_type")).distinct()
      .crossJoin(spark.range(0, PsiBins).select(col("id").as("bin")))
    val wide = spine
      .join(cells.filter(col("period") === 0).select(col("event_type"), col("bin"), col("c").as("c1")),
        Seq("event_type", "bin"), "left")
      .join(cells.filter(col("period") === 1).select(col("event_type"), col("bin"), col("c").as("c2")),
        Seq("event_type", "bin"), "left")
      .na.fill(0L, Seq("c1", "c2"))
    val wT = Window.partitionBy(col("event_type"))
    wide
      .withColumn("n1", sum(col("c1")).over(wT))
      .withColumn("n2", sum(col("c2")).over(wT))
      .withColumn("p", (col("c1") + 1L).cast("double") / (col("n1") + PsiBins).cast("double"))
      .withColumn("q", (col("c2") + 1L).cast("double") / (col("n2") + PsiBins).cast("double"))
      .withColumn("term", (col("p") - col("q")) * log(col("p") / col("q")))
      .groupBy(col("event_type"))
      .agg(max(col("n1")).as("n_before"), max(col("n2")).as("n_after"),
        sort_array(collect_list(struct(col("bin"), col("term")))).as("terms"))
      .select(col("event_type"), col("n_before"), col("n_after"),
        round(aggregate(col("terms"), lit(0.0), (a, t) => a + t.getField("term")), 6)
          .as("psi"))
  }

  /** Conversion-latency profile: per user, first view → first
    * subsequent purchase; the delay distribution is summarized by
    * exact interpolated eighth-percentiles (the q_quantiles
    * discipline — micros are < 2^53 longs, the blend is exact). The
    * number a growth team actually reads off a funnel: not whether
    * users convert, but how long it takes. One user-keyed shuffle
    * shared by both windows and the per-user reduce; the percentile
    * state is one aggregate over conversion count, not event count. */
  def funnelTime(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val qs = array(Seq(0.125, 0.25, 0.5, 0.75, 0.875).map(lit): _*)
    Tables.events(spark, sfDir)
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_view"), col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t_view")).as("t_view"), max(col("t_purchase")).as("t_purchase"))
      .filter(col("t_view").isNotNull && col("t_purchase").isNotNull)
      .select((unix_micros(col("t_purchase")) - unix_micros(col("t_view"))).as("delay_us"))
      .agg(count(lit(1)).as("n_conversions"), percentile(col("delay_us"), qs).as("q"))
      .select(col("n_conversions"),
        (col("q")(0) / 1000000.0).as("p125_s"), (col("q")(1) / 1000000.0).as("p25_s"),
        (col("q")(2) / 1000000.0).as("p50_s"), (col("q")(3) / 1000000.0).as("p75_s"),
        (col("q")(4) / 1000000.0).as("p875_s"))
  }
}
