package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Batch forms of the streaming operators (SURVEY.md §2.D). The
  * streaming module re-runs the same logic via readStream; these batch
  * plans are the correctness oracle for both.
  */
object Events {

  /** MAD→sigma consistency scale (1/Φ⁻¹(3/4) under normality); a
    * single literal shared with the generated oracle SQL. */
  final val MadK = 1.4826

  /** Forecast backtest holdout width (hours = one week). */
  final val FcTestHours = 168L

  /** Tumbling 1-hour window aggregation by event type. `window()` is
    * the same expression Structured Streaming groups on, so batch and
    * stream share a plan shape. */
  def eventsWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Hopping (sliding) 1-hour windows every 15 minutes, by event type —
    * the smoothed-rate view a monitoring dashboard renders. `window(ts,
    * '1 hour', '15 minutes')` is the same expression Structured
    * Streaming groups on (each event lands in exactly 4 windows; the
    * fan-out is the window/slide ratio, a constant — Spark expands it
    * row-locally before the ONE aggregation shuffle). Money sums ride
    * decimal and cast to double once, the house discipline. The oracle
    * states the same semantics arithmetically: 4 aligned starts per
    * event via generate_series over epoch micros. */
  def eventsHopping(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Linear time-weighted resample: each user's value series sampled
    * at exact hour marks by interpolating between the bracketing
    * events — the TWAP-style resample mode gapfill's LOCF is not
    * (interior hours only; a probe landing exactly on an event takes
    * that event's value).
    *
    * Consecutive-pair span explode: after the latest-wins collapse at
    * equal timestamps (max_by on event_id), ONE lead() window hands
    * each event its successor, and the pair OWNS every hour mark in
    * [us, next_us) — the probe grid, the bracket assignment, and the
    * blend all fall out of that row locally (an hour mark landing
    * exactly on next_us belongs to the NEXT pair, where it is the
    * exact-hit case; the final event emits only its own exact hit, so
    * the emitted set is precisely [ceil(min/h), floor(max/h)]). The
    * blend numerator is exact decimal(38,0) (cents × µs-gap products
    * overflow a long at month-long gaps) with ONE terminal double
    * divide, rounded to 6.
    *
    * Scale shape: two exchanges total — the (user, us) collapse and
    * the user-key window sort — where the union-and-fill-twice
    * formulation paid a third exchange plus TWO full sorts of the
    * events∪probes table (the reverse-ordered bracket window cannot
    * share the forward sort). Probes never travel through a shuffle at
    * all now; they are generated after the last exchange. */
  def eventsInterpolate(spark: SparkSession, sfDir: String): DataFrame = {
    val HourUs = 3600000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        col("event_id"))
      .groupBy(col("user_id"), col("us"))
      .agg(max_by(col("cents"), col("event_id")).as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    ev
      .withColumn("nus", lead(col("us"), 1).over(w))
      .withColumn("ncents", lead(col("cents"), 1).over(w))
      .withColumn("h_start", expr(s"(us + ${HourUs - 1}) div ${HourUs}L"))
      .withColumn("h_end",
        when(col("nus").isNotNull, expr(s"(nus + ${HourUs - 1}) div ${HourUs}L") - 1L)
          .otherwise(when(expr(s"us % ${HourUs}L") === 0L, expr(s"us div ${HourUs}L"))
            .otherwise(col("h_start") - 1L)))
      .filter(col("h_start") <= col("h_end"))
      .select(col("user_id"), col("us"), col("cents"), col("nus"), col("ncents"),
        explode(sequence(col("h_start"), col("h_end"))).as("h"))
      .withColumn("probe_us", col("h") * HourUs)
      .select(col("user_id"), col("probe_us"),
        round(
          when(col("probe_us") === col("us"), col("cents").cast("double"))
            .otherwise(
              (col("cents").cast("decimal(38,0)") * (col("nus") - col("probe_us")) +
                col("ncents").cast("decimal(38,0)") * (col("probe_us") - col("us")))
                .cast("double") / (col("nus") - col("us")).cast("double"))
            / 100.0, 6).as("value_interp"))
  }

  /** Per-user event-type transition matrix (first-order Markov view of
    * the session flow — the counts behind a Sankey/path diagram):
    * consecutive event pairs per user ordered by time, aggregated to
    * (from, to) cells with the row-normalized transition probability.
    * One user-key shuffle shared by the lag window and the reduce; the
    * probability normalizer rides a window over the |types|² cell
    * table. */
  def eventsTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val cells = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wF = Window.partitionBy(col("from_type"))
    cells
      .withColumn("from_total", sum(col("n")).over(wF))
      .select(col("from_type"), col("to_type"), col("n"), col("from_total"),
        round(col("n").cast("double") / col("from_total").cast("double"), 6).as("p"))
  }

  /** Week-over-week metric deltas per event type — the growth numbers
    * on the first page of every dashboard. Weeks are pure epoch
    * arithmetic (epoch_days div 7 — no engine calendar involved);
    * per-(type, week) counts and exact cent sums aggregate in one
    * shuffle, and the deltas come from a lag window over the tiny
    * type×week cell table. The first week of a type reports null
    * deltas (nothing to compare against) — both engines agree on the
    * nulls. */
  def eventsWow(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000 div 7").as("week"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("week"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("week"))
    cells
      .withColumn("prev_n", lag(col("n_events"), 1).over(w))
      .withColumn("prev_c", lag(col("cents"), 1).over(w))
      .select(col("event_type"), col("week"), col("n_events"),
        (col("cents").cast("double") / 100.0).as("total_value"),
        // explicit non-zero guards: ANSI mode faults even double /0,
        // and a zero-volume previous week has no meaningful ratio
        round(when(col("prev_n") =!= 0, (col("n_events") - col("prev_n")).cast("double")
          / col("prev_n").cast("double")), 6).as("wow_events"),
        round(when(col("prev_c") =!= 0, (col("cents") - col("prev_c")).cast("double")
          / col("prev_c").cast("double")), 6).as("wow_value"))
  }

  /** Day-of-week × hour-of-day activity heatmap per event type — the
    * seasonality matrix behind load forecasts and anomaly baselines.
    * Day-of-week comes from pure epoch arithmetic ((epoch_days + 4)
    * mod 7, anchored on 1970-01-01 = Thursday; 0 = Sunday) rather than
    * an engine's dayofweek() — Spark counts Sunday = 1 and DuckDB
    * Sunday = 0, so the portable form IS the integer formula. One
    * aggregation shuffle onto type×7×24 cells; the per-type share
    * rides a window over the tiny cell table. */
  def eventsHeatmap(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .select(col("event_type"),
        pmod(expr("us div 86400000000") + 4, lit(7L)).as("dow"),
        expr("(us % 86400000000) div 3600000000").as("hour"),
        col("cents"))
      .groupBy(col("event_type"), col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
    val wT = Window.partitionBy(col("event_type"))
    cells
      .withColumn("type_total", sum(col("n_events")).over(wT))
      .select(col("event_type"), col("dow"), col("hour"), col("n_events"),
        (col("cents").cast("double") / 100.0).as("total_value"),
        round(col("n_events").cast("double") / col("type_total").cast("double"), 6)
          .as("share"))
  }

  /** Exponentially-weighted moving average of hourly value volume per
    * event type (α = 1/2) — the smoothed baseline a monitoring system
    * tracks instead of raw hourly noise. α = 1/2 is deliberate: the
    * recurrence s₁ = x₁, sₜ = (xₜ + sₜ₋₁)/2 is pure halving, and BOTH
    * engines evaluate it as the identical left-to-right fold (Spark
    * `aggregate` over the hour-sorted prefix, DuckDB `list_reduce`
    * over the same slice), so every intermediate double is
    * bit-identical — the sorted-fold float discipline, applied to a
    * sequential recurrence.
    *
    * Scale shape: one corpus shuffle (the hourly aggregate), then a
    * per-type collect of the HOURLY series — bounded by elapsed hours,
    * not event volume, at any scale. The per-row prefix fold is O(H²)
    * per type on that bounded series (H = hours), the price of
    * replaying the recurrence identically in SQL; a library stream
    * maintains sₜ incrementally instead. */
  def eventsEwma(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("cents"))
    hourly.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("hour"), col("n_events"), col("cents")))).as("xs"))
      .select(col("event_type"), col("xs"), posexplode(col("xs")).as(Seq("i0", "x")))
      .withColumn("ewma_cents", expr(
        """aggregate(slice(xs, 1, i0 + 1), cast(null as double),
          |  (acc, e) -> if(acc is null, cast(e.cents as double), (acc + cast(e.cents as double)) / 2.0d))"""
          .stripMargin))
      .select(col("event_type"), col("x.hour").as("hour"),
        col("x.n_events").as("n_events"),
        (col("x.cents").cast("double") / 100.0).as("hour_value"),
        round(col("ewma_cents") / 100.0, 6).as("ewma_value"))
  }

  /** Time-range rolling features per user: count and value-sum over a
    * trailing 1-hour EVENT-TIME window ending at each event — a RANGE
    * frame over micros, not a row frame, so sparse and bursty users
    * get the same time semantics (the resample-free form of rolling
    * features a feature store computes). One shuffle (the user_id
    * window partitioning); the frame sum is an exact decimal over a
    * well-defined peer set, cast to double once at the end, so both
    * engines emit the identical value regardless of partition count.
    * Frame width is bounded by a user's 1-hour event rate, never by
    * history length. */
  def eventsRolling(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000, 0)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .withColumn("value_last_hour",
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("decimal(18,2)").cast("double"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("n_last_hour"), col("value_last_hour"))
  }

  /** Semi-structured props: parse the JSON column once with from_json
    * (schema'd, codegen-adjacent — no per-field re-parse), then
    * aggregate typed fields. The pattern for event payloads at scale:
    * parse → project → never carry the raw string past the scan. */
  def eventsProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("p", from_json(col("props"), lit("k INT")))
      .groupBy(col("event_type"), pmod(col("p.k"), lit(10)).as("k_mod"))
      .agg(count(lit(1)).as("n"),
        sum(col("p.k")).as("k_sum"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").cast("double").as("total_value"))

  /** Exactly-once ingestion in batch form: a source slice is
    * re-delivered (every 10th event duplicated — the at-least-once
    * delivery a real bus exhibits), dropDuplicates on the event key
    * restores one row per event, then the per-type rollup runs on the
    * deduplicated stream. The streaming twin
    * (EventStreams.deduplicated) is the same dropDuplicates bounded by
    * a watermark. */
  def eventsDedup(spark: SparkSession, sfDir: String): DataFrame = {
    // project BEFORE the dedup shuffle: only the key and the two
    // aggregated columns travel (ts/user_id/props stay in the scan)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    val redelivered = ev.unionByName(ev.filter(pmod(col("event_id"), lit(10)) === 0))
    redelivered.dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").cast("double").as("total_value"))
  }

  /** Overlapping-interval union (interval merge) per user — the
    * coverage operator sessionization doesn't express: each event
    * opens a DURATION (here 5 + event_id mod 55 minutes,
    * deterministic), and overlapping/touching-by-overlap intervals
    * coalesce into their union so total covered time counts each
    * instant once (device-connected time, lock leases, on-call
    * coverage). Classic sweep as windows: running max(end) over
    * preceding rows → break flag when a gap opens → prefix-sum group
    * number → per-group min/max. ONE shuffle on user_id; both windows
    * and the final agg reuse the same sort. All arithmetic in exact
    * epoch micros. */
  def intervalMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val iv = Tables.events(spark, sfDir).select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("s"),
      (unix_micros(col("ts")) +
        (lit(5L) + pmod(col("event_id"), lit(55))) * 60000000L).as("e"))
    val ord = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
    iv.withColumn("maxe",
        max(col("e")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk",
        when(col("maxe").isNull || col("s") > col("maxe"), 1L).otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("s")).as("start_us"), max(col("e")).as("end_us"),
        count(lit(1)).as("n_merged"))
      .select(col("user_id"), col("grp").as("interval_no"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("span_us"), col("n_merged"))
  }

  /** Gap-based sessionization (30-min inactivity closes a session):
    * lag → new-session flag → running session number → per-session agg.
    * One shuffle on user_id, reused by both windows and the final agg. */
  def eventsSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000).cast("int"))
      .withColumn("session_num", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_num"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").cast("double").as("total_value"))
  }

  /** Ordered conversion funnel (view → click → purchase) per user:
    * first view, first click strictly after that view, first purchase
    * strictly after that click. Three chained unbounded windows over
    * the SAME user_id partitioning — Catalyst plans one shuffle and
    * reuses it, so the sequential time dependency costs no extra
    * exchange. A self-join formulation would shuffle three times. */
  def eventsFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(spark, sfDir)
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"), col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"), col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t_view")).as("t_view"), max(col("t_click")).as("t_click"),
        max(col("t_purchase")).as("t_purchase"))
      .withColumn("steps_reached",
        when(col("t_purchase").isNotNull, 3L).when(col("t_click").isNotNull, 2L)
          .when(col("t_view").isNotNull, 1L).otherwise(0L))
  }

  /** Time-series resample + gap-fill: each user's event stream becomes
    * a dense hourly grid from their first to last active hour; silent
    * hours get n_events = 0 and carry the last observed hourly total
    * forward (LOCF — the resample step before any rolling-feature
    * computation).
    *
    * Scale shape: the grid is generated DISTRIBUTED via
    * sequence()+explode — no driver range, no cross join against a
    * global calendar — and it is generated AFTER the last exchange:
    * one lead() window over the hourly aggregate hands each observed
    * hour its successor, and the row then owns every grid hour in
    * [hr, next_hr) locally (silent hours get n_events = 0 and the
    * row's LOCF carry; the final observed hour closes the grid at hr
    * = max, so the union of spans is exactly [min, max]). The carry
    * itself is a growing-frame last(ignoreNulls) over the SAME
    * user-key sort the lead uses — observed hours are the only LOCF
    * change points, so filling at the observed row and broadcasting
    * it across the span is identical to filling the dense grid. Two
    * exchanges total — the (user, hr) pre-aggregate and the user-key
    * window sort — where the grid-agg + left-join-back formulation
    * paid a third aggregate exchange plus a join whose probe side was
    * the full dense grid. */
  def eventsGapfill(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("hr_value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
    hourly
      .withColumn("filled_value",
        last(col("hr_value"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("next_hr", lead(col("hr"), 1).over(w))
      .select(col("user_id"), col("hr").as("obs_hr"), col("n_events"), col("filled_value"),
        explode(expr("sequence(hr, coalesce(next_hr - INTERVAL 1 HOUR, hr), INTERVAL 1 HOUR)"))
          .as("hr"))
      .select(col("user_id"), col("hr"),
        when(col("hr") === col("obs_hr"), col("n_events")).otherwise(lit(0L)).as("n_events"),
        col("filled_value"))
  }

  /** Hourly volume anomalies per event type: hours whose count sits
    * more than 2 population-σ from that type's mean hourly count.
    * Moments (n, Σc, Σc²) aggregate as exact integers, so mean/σ are
    * single fixed-order double expressions both engines compute
    * identically; z rounds to 6 decimals. Two tiny shuffles — the
    * (type, hour) count and the per-type moment rollup (broadcast back
    * onto the hourly table, which is |hours|×|types|, not |events|). */
  def eventsAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("cnt")).as("sc"),
        sum(col("cnt") * col("cnt")).as("scc"))
      // population variance in exact integer parts: n·Σc² − (Σc)²
      .withColumn("var_num", col("n_hours") * col("scc") - col("sc") * col("sc"))
      .filter(col("var_num") > 0)
    hourly.join(broadcast(stats), Seq("event_type"))
      .withColumn("mean_cnt", col("sc").cast("double") / col("n_hours").cast("double"))
      .withColumn("z", round(
        (col("cnt").cast("double") - col("mean_cnt")) /
          (sqrt(col("var_num").cast("double")) / col("n_hours").cast("double")), 6))
      .filter(abs(col("z")) > 2)
      .select(col("event_type"), col("hr"), col("cnt"),
        round(col("mean_cnt"), 6).as("mean_cnt"), col("z"))
  }

  /** SEASONALITY STRENGTH per event type (the STL F_s statistic over
    * the hour-of-day component): 1 − Var(residual)/Var(total), where
    * the seasonal component is the (type, hod) cell mean — the ONE
    * number that says whether events_residual_anomaly's
    * seasonal-baseline machinery is buying anything on this stream
    * (F_s ≈ 0 → the global-z alarm was fine; F_s near 1 → hour-of-day
    * explains most variance).
    *
    * Exactness: Σ(c − cell_mean)² decomposes to Σc² − Σ_cells(sc²/n) —
    * the only non-integer terms are the 24 per-cell one-divide
    * rationals, summed through the sorted-fold rule; Var(total)'s
    * correction (Σc)²/N is one more divide. Fixed-order terminal
    * expression, round 6, zero-variance typed null. Scale shape: one
    * hourly reduce, a 24×|types| cell agg, a |types|-row output. */
  def seasonalityStrength(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("hr_us", expr("(us div 3600000000) * 3600000000"))
      .groupBy(col("event_type"), col("hr_us"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("hod", expr("(hr_us % 86400000000) div 3600000000"))
    val cells = hourly.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_cell"), sum(col("cnt")).as("sc"))
      .select(col("event_type"),
        (col("sc").cast("decimal(38,0)") * col("sc")).cast("double")
          ./(col("n_cell").cast("double")).as("cell_term"))
      .groupBy(col("event_type"))
      .agg(aggregate(sort_array(collect_list(col("cell_term"))), lit(0.0),
        (a, x) => a + x).as("b_seasonal"))
    val tot = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("cnt")).as("sc_tot"),
        sum(col("cnt") * col("cnt")).as("a_sq"))
    tot.join(cells, Seq("event_type"))
      .withColumn("c_corr",
        (col("sc_tot").cast("decimal(38,0)") * col("sc_tot")).cast("double")
          / col("n_hours").cast("double"))
      .withColumn("var_total",
        (col("a_sq").cast("double") - col("c_corr")) / col("n_hours").cast("double"))
      .withColumn("var_resid",
        (col("a_sq").cast("double") - col("b_seasonal")) / col("n_hours").cast("double"))
      .select(col("event_type"), col("n_hours"),
        round(col("var_total"), 6).as("var_total"),
        round(col("var_resid"), 6).as("var_resid"),
        when(col("a_sq").cast("double") === col("c_corr"), lit(null).cast("double"))
          .otherwise(round(greatest(lit(0.0),
            lit(1.0) - col("var_resid") / col("var_total")), 6)).as("strength"))
  }

  /** TIME-WEIGHTED AVERAGE value per (type, day) — the
    * irregular-sampling aggregation a plain AVG silently gets wrong:
    * each event's value HOLDS until the next event of that type in
    * the same day, so sparse readings weigh by their duration
    * (TWA = Σ vᵢ·Δtᵢ / Σ Δtᵢ over consecutive-event segments; the
    * trailing observation has no duration and drops; days with one
    * event emit no row — there is no honest average of zero
    * segments). The telemetry/metering aggregate (sensor gauges,
    * account balances, price feeds).
    *
    * Exactness: Δt is exact µs, Σ v·Δt rides decimal(38,0), ONE
    * terminal divide. One windowed lead inside hash(type, day), then
    * a map-side-combined reduce. A hot (type, day) partition at
    * 100 TB splits by sub-windows whose boundary segments stitch in a
    * second pass — the library form; the gate form is the plain
    * window. */
  def eventsTwa(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .withColumn("day", expr("us div 86400000000"))
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("us"), col("event_id"))
    ev.withColumn("nxt", lead(col("us"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .withColumn("dt", col("nxt") - col("us"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("dt")).as("span_us"),
        sum(col("cents").cast("decimal(38,0)") * col("dt")).as("wsum"))
      .select(col("event_type"), col("day"), col("n_segments"), col("span_us"),
        when(col("span_us") > 0,
          round(col("wsum").cast("double") / col("span_us").cast("double") / 100.0, 6))
          .as("twa_value"))
  }

  /** Session-gap sweep grid (minutes) — extends to day-scale gaps
    * because this corpus's users emit ~daily events (probed: the
    * 5..60-minute band moved session counts only 9919 → 9147 at
    * sf0.01; the day-scale band is where the elbow lives). */
  val SessionGapGrid: Seq[Long] = Seq(5L, 15L, 30L, 60L, 240L, 1440L, 4320L)

  /** SESSION-GAP TUNING: session count and events-per-session under
    * each candidate inactivity gap — the pre-run measurement that
    * picks events_sessionize's 30-minute constant instead of
    * inheriting it (the minhash_band_tune / ann_tune family, for the
    * events side). The trick: re-sessionizing per gap is unnecessary —
    * sessions(g) = users + |{consecutive-event deltas > g}|, so ONE
    * per-user lag pass (inside the hash(user) layout
    * events_sessionize needs anyway) feeds every gap as a conditional
    * count. Exact longs into one terminal divide per gap row. */
  def sessionGapTune(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val deltas = ev.withColumn("delta_us", col("us") - lag(col("us"), 1).over(w))
    val totals = ev.agg(count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"))
    val gapAggs = SessionGapGrid.map(g =>
      sum(when(col("delta_us") > g * 60000000L, 1L).otherwise(0L)).as(s"brk_$g"))
    deltas.agg(gapAggs.head, gapAggs.tail: _*)
      .crossJoin(broadcast(totals))
      .select(explode(array(SessionGapGrid.map(g =>
        struct(lit(g).as("gap_minutes"),
          (col("n_users") + col(s"brk_$g")).as("n_sessions"))): _*)).as("r"),
        col("n_events"))
      .select(col("r.gap_minutes").as("gap_minutes"),
        col("r.n_sessions").as("n_sessions"),
        round(col("n_events").cast("double") / col("r.n_sessions").cast("double"), 6)
          .as("events_per_session"))
  }

  /** SEASONALITY-ADJUSTED anomaly detection: z-scores within each
    * (type, hour-of-day) SEASONAL CELL rather than against the type's
    * global hourly mean — the upgrade that stops the daily-cycle peak
    * hour from tripping the global-z alarm (events_anomaly) while a
    * genuinely anomalous instance of that hour still trips its own
    * cell's. The cell is (type, hod), NOT (type, dow, hod): the dow
    * split was measured structurally degenerate on a month of data —
    * ~4 samples per cell, and a population z within n samples is
    * bounded by √(n−1) < 2, so the alarm could never fire; hod cells
    * carry ≥25 samples and grow with corpus span (131 anomalies of
    * 3385 hours at sf0.01). Same exact-integer variance discipline
    * (n·Σc² − (Σc)² per cell), hod from pure epoch arithmetic (the
    * events_heatmap portability rule). Scale shape: one
    * |events|-sized hourly reduce, then 24×|types| cell stats
    * broadcast back onto the calendar-scale hourly table. */
  def eventsResidualAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .withColumn("hr_us", expr("(us div 3600000000) * 3600000000"))
      .groupBy(col("event_type"), col("hr_us"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("hod", expr("(hr_us % 86400000000) div 3600000000"))
    val cellStats = hourly.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_hours"), sum(col("cnt")).as("sc"),
        sum(col("cnt") * col("cnt")).as("scc"))
      .withColumn("var_num", col("n_hours") * col("scc") - col("sc") * col("sc"))
      .filter(col("var_num") > 0)
    hourly.join(broadcast(cellStats), Seq("event_type", "hod"))
      .withColumn("cell_mean", col("sc").cast("double") / col("n_hours").cast("double"))
      .withColumn("z", round(
        (col("cnt").cast("double") - col("cell_mean")) /
          (sqrt(col("var_num").cast("double")) / col("n_hours").cast("double")), 6))
      .filter(abs(col("z")) > 2)
      .select(col("event_type"), col("hr_us"), col("hod"), col("cnt"),
        round(col("cell_mean"), 6).as("cell_mean"), col("z"))
  }

  /** CUSUM CHANGE-POINT chart over daily volumes per event type — the
    * sequential drift detector that catches a sustained small shift a
    * z/MAD spike test misses (Page's cumulative-sum control chart).
    * C_t = max(0, C_{t-1} + (x_t − μ)) accumulates excess volume over
    * the type's mean daily count; an alarm fires while the
    * accumulated excess exceeds one mean day (C_t > μ).
    *
    * Exactness: the recursion is NOT window-expressible directly but
    * its closed form is — with S_t = Σ_{j≤t}(x_j − μ),
    * C_t = S_t − min(0, min_{j≤t} S_j) — and scaling by D (the spine
    * day count) clears μ = T/D into integers: every window runs on
    * exact longs (D·x − T prefix sums, running min), the one double
    * is the terminal divide, round 6. Alarm compares longs.
    *
    * Scale shape: one |events|-sized daily reduce (map-side
    * combined); the spine/windows run on (type × days) — calendar
    * scale — inside one hash(event_type) layout; the global day range
    * and per-type totals are one-row/|types| broadcasts. */
  def eventsCusum(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val range = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val types = daily.select(col("event_type")).distinct()
    val spine = types.crossJoin(broadcast(range))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val cells = spine.join(daily, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("n_events"))
    val totals = cells.groupBy(col("event_type"))
      .agg(sum(col("n_events")).as("t_total"), count(lit(1)).as("n_days"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(totals), Seq("event_type"))
      .withColumn("s", sum(col("n_days") * col("n_events") - col("t_total")).over(wCum))
      .withColumn("c", col("s") - least(min(col("s")).over(wCum), lit(0L)))
      .select(col("event_type"),
        to_date(timestamp_micros(col("day") * 86400000000L)).as("day"),
        col("n_events"),
        round(col("c").cast("double") / col("n_days").cast("double"), 6)
          .as("excess"),
        (col("c") > col("t_total")).as("alarm"))
  }

  /** Robust-statistics twin of eventsAnomaly: hours flagged by MEDIAN
    * ABSOLUTE DEVIATION instead of mean/stddev. A z-score baseline is
    * itself dragged by the outliers it hunts (one huge hour inflates
    * sigma and hides the rest); the MAD estimator has a 50% breakdown
    * point, so a burst can't mask its siblings — the robust detector a
    * pipeline actually wants on bursty telemetry.
    *
    * Exactness: hourly counts are integers, so the interpolated median
    * is k or k+0.5 (exact in double), absolute deviations are exact
    * halves, the MAD is again exact, and 3·MAD stays exact — the flag
    * comparison is bit-deterministic in both engines. The consistency
    * scale 1.4826 (≈1/Φ⁻¹(3/4), MAD→sigma under normality) is ONE
    * Scala literal embedded verbatim in the oracle; robust_z rounds to
    * 6 decimals after a deterministic IEEE divide.
    *
    * Scale shape: the only |events|-sized pass is the first hourly
    * count (map-side combined); medians run over the tiny
    * (type × hours) table — a holistic percentile there is fine
    * because the state is bounded by hours-per-type, not events. The
    * two stat tables broadcast back. No streaming twin: an exact
    * median is not incrementally mergeable — the streaming analogue
    * is events_anomaly's moment-based score. */
  def eventsMad(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt"))
    val med = hourly.groupBy(col("event_type"))
      .agg(percentile(col("cnt"), lit(0.5)).as("med_cnt"))
    val dev = hourly.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("cnt") - col("med_cnt")))
    val mad = dev.groupBy(col("event_type"))
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("mad") > 0 && col("adev") > lit(3.0) * col("mad"))
      .select(col("event_type"), col("hr"), col("cnt"), col("med_cnt"),
        col("mad"),
        round((col("cnt") - col("med_cnt")) / (lit(MadK) * col("mad")), 6)
          .as("robust_z"))
  }

  /** Seasonal-profile forecast BACKTEST — the time-series evaluation a
    * pipeline runs before trusting a volume forecast: hold out the
    * last week of hourly counts, fit the hour-of-day seasonal profile
    * per event type on the train span, score the holdout with MAE,
    * and report SKILL vs the train-mean naive baseline (skill > 0 =
    * the seasonal profile beats a flat forecast). Scored on observed
    * test hours (the gapfill operator owns dense-grid semantics).
    *
    * Determinism: the split boundary is exact epoch-micros integer
    * arithmetic off the global max hour; model and baseline
    * predictions are single divides of exact integer sums; per-type
    * MAE folds a SORTED error list (the bigram_lm_score pattern) and
    * rounds to 6; skill derives from the two ROUNDED MAEs.
    *
    * Scale shape: one |events|-sized hourly reduce; everything after
    * runs on (type × hours) and (type × 24) tables with the two
    * scalar/model tables broadcast back. */
  def eventsForecast(spark: SparkSession, sfDir: String): DataFrame = {
    val hourly = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("hr_us", unix_micros(col("hr")))
      .withColumn("hod", hour(col("hr")))
    val cut = hourly.agg(
      (max(col("hr_us")) - (FcTestHours - 1) * 3600L * 1000000L).as("cut_us"))
    val tagged = hourly.crossJoin(broadcast(cut))
    val train = tagged.filter(col("hr_us") < col("cut_us"))
    val test = tagged.filter(col("hr_us") >= col("cut_us"))
    val model = train.groupBy(col("event_type"), col("hod"))
      .agg(sum(col("cnt")).as("s"), count(lit(1)).as("n"))
    val base = model.groupBy(col("event_type"))
      .agg(sum(col("s")).as("st"), sum(col("n")).as("nt"))
    val trainHours = train.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_train_hours"))
    val scored = test
      .join(model, Seq("event_type", "hod"))
      .join(broadcast(base), Seq("event_type"))
      .withColumn("err_m",
        abs(col("cnt").cast("double") - col("s").cast("double") / col("n").cast("double")))
      .withColumn("err_b",
        abs(col("cnt").cast("double") - col("st").cast("double") / col("nt").cast("double")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_test_hours"),
        sort_array(collect_list(col("err_m"))).as("ems"),
        sort_array(collect_list(col("err_b"))).as("ebs"))
      .withColumn("mae_model", round(
        aggregate(col("ems"), lit(0.0), (a, x) => a + x) / col("n_test_hours"), 6))
      .withColumn("mae_base", round(
        aggregate(col("ebs"), lit(0.0), (a, x) => a + x) / col("n_test_hours"), 6))
    scored.join(trainHours, Seq("event_type"))
      .select(col("event_type"), col("n_train_hours"), col("n_test_hours"),
        col("mae_model"), col("mae_base"),
        when(col("mae_base") > 0,
          round(lit(1.0) - col("mae_model") / col("mae_base"), 6))
          .otherwise(lit(null).cast("double")).as("skill"))
  }

  /** Last-touch attribution: each purchase attributes to the user's
    * most recent click at most 1 hour before it (clicks first deduped
    * to one id per (user, ts)). The streaming twin is the stream-stream
    * interval join EventStreams parity-tests; this batch form is the
    * gate oracle.
    *
    * Scale shape: candidates form through a BUCKETIZED equi-join — a
    * purchase probes its own and the previous hour bucket, so the join
    * never degenerates into a per-user cross product (the RangeJoin
    * pattern). The latest-click argmax then runs through the
    * bounded-heap TopK operator with k=1: map-side heaps reduce each
    * purchase's candidates before the shuffle. */
  def eventsAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    val widthUs = 3600L * 1000000
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), unix_micros(col("ts")).as("click_us"), col("click_id"))
      .withColumn("bucket", expr(s"click_us div $widthUs"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"))
      .withColumn("bucket",
        explode(array(expr(s"purchase_us div $widthUs"), expr(s"purchase_us div $widthUs - 1"))))
    purchases.join(clicks, Seq("user_id", "bucket"))
      .filter(col("click_us") <= col("purchase_us") &&
        col("purchase_us") - col("click_us") <= widthUs)
      .transform(graft.plans.TopK.perGroup(
        Seq("purchase_id"), Seq("click_us" -> false, "click_id" -> false), 1))
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        col("click_id"), col("click_us"),
        (col("purchase_us") - col("click_us")).as("gap_us"))
  }

  /** Complex-event-processing pattern match: purchases whose LATEST
    * view within the preceding hour had NO intervening click — the
    * "A then B within t, without C between" shape (direct-conversion
    * detection) that CEP engines express with MATCH_RECOGNIZE and a
    * pipeline wants as a set-oriented plan.
    *
    * Execution strategy vs semantics: the (view, purchase) candidates
    * form through the BUCKETIZED interval join (the attribution
    * pattern — a purchase probes its own and the previous hour bucket,
    * so no per-user cross product), the latest-view argmax runs
    * through bounded-heap TopK with k=1, and the no-click-between
    * negation is a SEMI-join (pairs with an intervening click) fed
    * into an ANTI-join — never a per-row correlated probe. The oracle
    * states the same semantics as a plain theta join + NOT EXISTS;
    * bucketization changes the plan, not the answer.
    *
    * Scale shape: three filtered scans of the same events pass, joins
    * keyed on (user, hour-bucket), candidate volume bounded by the
    * 1-hour window; nothing is events×events. */
  def eventsPattern(spark: SparkSession, sfDir: String): DataFrame = {
    val widthUs = 3600L * 1000000
    val ev = Tables.events(spark, sfDir)
    def typed(t: String, idAs: String, usAs: String): DataFrame =
      ev.filter(col("event_type") === t)
        .select(col("event_id").as(idAs), col("user_id"),
          unix_micros(col("ts")).as(usAs))
    val views = typed("view", "view_id", "view_us")
      .withColumn("bucket", expr(s"view_us div $widthUs"))
    val purchases = typed("purchase", "purchase_id", "purchase_us")
      .withColumn("bucket", explode(array(
        expr(s"purchase_us div $widthUs"), expr(s"purchase_us div $widthUs - 1"))))
    val latest = purchases.join(views, Seq("user_id", "bucket"))
      .filter(col("view_us") <= col("purchase_us") &&
        col("purchase_us") - col("view_us") <= widthUs)
      .transform(graft.plans.TopK.perGroup(
        Seq("purchase_id"), Seq("view_us" -> false, "view_id" -> false), 1))
      .select(col("purchase_id"), col("user_id"), col("purchase_us"),
        col("view_id"), col("view_us"))
    val clicks = typed("click", "click_id", "click_us")
      .withColumn("cbucket", expr(s"click_us div $widthUs"))
    // pairs WITH an intervening click (semi), then excluded (anti) —
    // the exploded-bucket probe makes the semi an equi-join
    val probed = latest.withColumn("cbucket", explode(array(
      expr(s"view_us div $widthUs"), expr(s"purchase_us div $widthUs")))).distinct()
    val withClick = probed.join(clicks, Seq("user_id", "cbucket"))
      .filter(col("click_us") > col("view_us") && col("click_us") < col("purchase_us"))
      .select(col("purchase_id")).distinct()
    latest.join(withClick, Seq("purchase_id"), "left_anti")
      .select(col("purchase_id"), col("user_id"), col("view_id"),
        col("view_us"), col("purchase_us"),
        (col("purchase_us") - col("view_us")).as("gap_us"))
  }

  /** Cohort retention: users grouped by the week of their first signup
    * (weeks counted from the corpus epoch 2024-01-01), counted distinct
    * in each later week-offset where they emitted any event. Two
    * shuffles total: the per-user first-signup agg and the cohort-cell
    * count-distinct; the (user, day) distinct folds into the first
    * aggregate's partitioning. */
  /** Longest consecutive-day activity STREAK per user — the
    * gaps-and-islands classic (engagement scoring, habit metrics).
    * Days are pure epoch arithmetic (unix_micros div 86400000000, the
    * events_heatmap portability rule). Island key = day − row_number:
    * constant within a run of consecutive days, distinct across gaps —
    * no self-join, no recursion.
    *
    * Scale shape: the explicit repartition(user_id) exchange is built
    * ONCE and its hash(user_id) layout satisfies the (user, day) dedup
    * aggregate, the row_number window, the island reduce, and the
    * final per-user reduce — four clustered stages, one shuffle. */
  def eventsStreak(spark: SparkSession, sfDir: String): DataFrame = {
    val n = spark.sessionState.conf.numShufflePartitions
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .repartition(n, col("user_id"))
      .dropDuplicates("user_id", "day")
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"))
  }

  /** Weekly growth-accounting LIFECYCLE: every active (user, week) is
    * classified new / retained / resurrected against the user's
    * previous active week, and each inactive week following an active
    * one contributes a churned row to the week the user went missing —
    * the four numbers under every growth chart (Reforge accounting
    * identity: active_w = new + retained + resurrected).
    *
    * Weeks are epoch arithmetic (div 7 on epoch days, the events_wow
    * rule). The churn attribution needs the corpus's last week (a user
    * silent after the stream ends is right-censored, not churned) — a
    * one-row broadcast. One user-keyed shuffle shared by the dedup and
    * the lag/lead windows; the final reduce is week-cell sized. */
  def eventsLifecycle(spark: SparkSession, sfDir: String): DataFrame = {
    val n = spark.sessionState.conf.numShufflePartitions
    val weeks = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000 div 7").as("week"))
      .repartition(n, col("user_id"))
      .dropDuplicates("user_id", "week")
    val maxWeek = weeks.agg(max(col("week")).as("max_week"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("week"))
    val flagged = weeks
      .withColumn("prev_week", lag(col("week"), 1).over(w))
      .withColumn("next_week", lead(col("week"), 1).over(w))
      .crossJoin(broadcast(maxWeek))
    val active = flagged.select(col("week"),
      when(col("prev_week").isNull, lit("new"))
        .when(col("prev_week") === col("week") - 1, lit("retained"))
        .otherwise(lit("resurrected")).as("status"))
    // a user active in w but not w+1 churns IN w+1 (unless the stream
    // itself ends at w — right-censored, no verdict possible)
    val churned = flagged
      .filter(col("week") < col("max_week") &&
        (col("next_week").isNull || col("next_week") > col("week") + 1))
      .select((col("week") + 1).as("week"), lit("churned").as("status"))
    active.unionByName(churned)
      .groupBy(col("week"))
      .agg(
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("status") === "churned", 1L).otherwise(0L)).as("n_churned"))
  }

  /** Daily NEW vs RETURNING users plus the running cumulative distinct
    * user count — the audience-growth curve. Each user reduces to a
    * first-seen day (one user-keyed shuffle, map-side combined);
    * per-day totals and the running sum then live on the day-cell
    * table, which is calendar-bounded — it grows with elapsed TIME,
    * not data volume, so the unpartitioned cumulative window is the
    * benign bounded-global-window class (Skyline/Tokenize precedent),
    * not a scale hazard. */
  def eventsNewusers(spark: SparkSession, sfDir: String): DataFrame = {
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
    val firstSeen = days.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val dailyActive = days.dropDuplicates("user_id", "day")
      .groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val dailyNew = firstSeen.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("n_new"))
    val wc = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dailyActive.join(dailyNew, Seq("day"), "left")
      .na.fill(0L, Seq("n_new"))
      .withColumn("cum_users", sum(col("n_new")).over(wc))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"), col("cum_users"))
  }

  /** Cohort LIFETIME-VALUE curves: users cohorted by first-active
    * week, purchase revenue aggregated per (cohort, week offset), and
    * the running cumulative revenue per cohort divided by cohort size
    * — the LTV-by-age table under every payback-period decision
    * (the revenue companion of events_retention's activity grid).
    *
    * Scale shape: first-seen reduce and the revenue cells share one
    * user-keyed shuffle (the cohort join back onto per-user-week
    * revenue is user-keyed too); the cumulative window runs per cohort
    * over OFFSET cells — calendar-bounded, like events_newusers. Money
    * stays in exact cents until the final per-user divide (round 6). */
  def eventsLtv(spark: SparkSession, sfDir: String): DataFrame = {
    val n = spark.sessionState.conf.numShufflePartitions
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000 div 7").as("week"),
        when(col("event_type") === "purchase",
          (col("value").cast("decimal(18,2)") * 100).cast("long")).otherwise(0L)
          .as("cents"))
      .repartition(n, col("user_id"))
    val cohorts = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    val cohortSize = cohorts.groupBy(col("cohort")).agg(count(lit(1)).as("n_users"))
    val cells = ev
      .join(cohorts, Seq("user_id"))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
      .agg(sum(col("cents")).as("cents"))
    val wc = Window.partitionBy(col("cohort")).orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, 0)
    cells
      .withColumn("cum_cents", sum(col("cents")).over(wc))
      .join(cohortSize, Seq("cohort"))
      .select(col("cohort"), col("week_offset"), col("n_users"),
        (col("cents").cast("double") / 100.0).as("revenue"),
        round(col("cum_cents").cast("double") / col("n_users").cast("double")
          / 100.0, 6).as("ltv_per_user"))
  }

  /** Reported top paths. */
  final val PathTopN = 20L

  /** TOP EVENT PATHS: the most frequent length-3 behavior sequences
    * across all users (the "what do people actually do" table behind a
    * Sankey) — the order-2 extension of events_transitions' order-1
    * matrix. Consecutive type trigrams per user via two lag windows in
    * ONE user-key shuffle; the path census is |types|³-bounded, and the
    * report reduces through the bounded-heap global TopK (map tasks
    * forward ≤ N rows — no global sort). Share is one divide by the
    * broadcast total. */
  def eventsPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val paths = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t1", lag(col("event_type"), 1).over(w))
      .withColumn("t2", lag(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(concat_ws(">", col("t2"), col("t1"), col("event_type")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
    val total = paths.agg(sum(col("n")).as("total"))
    paths
      .transform(graft.plans.TopK.perGroup(
        Seq(), Seq("n" -> false, "path" -> true), PathTopN.toInt))
      .crossJoin(broadcast(total))
      .select(col("path"), col("n"),
        round(col("n").cast("double") / col("total").cast("double"), 6).as("share"))
  }

  /** HOURLY AUTOCORRELATION per event type at lags 1 and 24 — the
    * seasonality-strength diagnostic that justifies (or refutes) the
    * hour-of-day model events_forecast fits: r₂₄ ≫ r₁ means daily
    * seasonality dominates noise. The series is the DENSE hourly cent
    * volume (missing hours are true zeros — the gapfill rule;
    * computing lags over only-present hours would silently misalign
    * them), materialized per type as a calendar-bounded sorted array;
    * r_k folds index-aligned products in ascending order (the
    * psi_drift sorted-fold float rule, index form on BOTH engines),
    * one divide per lag, round 6. Guards: lag ≥ series length or a
    * constant series report null. One aggregation shuffle onto
    * type×hour cells; everything after is cell arithmetic. */
  def eventsAutocorr(spark: SparkSession, sfDir: String): DataFrame = {
    val HourUs = 3600000000L
    val cells = Tables.events(spark, sfDir)
      .select(col("event_type"), expr(s"unix_micros(ts) div ${HourUs}L").as("h"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("h")).agg(sum(col("cents")).as("c"))
    val spine = cells.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"), explode(sequence(col("h0"), col("h1"))).as("h"))
    val series = spine.join(cells, Seq("event_type", "h"), "left")
      .na.fill(0L, Seq("c"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("h"), col("c")))).as("s"))
      .select(col("event_type"),
        expr("transform(s, x -> CAST(x.c AS DOUBLE) / 100.0)").as("a"))
      .withColumn("t", size(col("a")).cast("long"))
      .withColumn("mu",
        aggregate(col("a"), lit(0.0), (acc, x) => acc + x) / col("t").cast("double"))
    def rk(lag: Int) = {
      val num = expr(
        s"""aggregate(transform(sequence(1, CAST(t AS INT) - $lag),
           | i -> (element_at(a, i) - mu) * (element_at(a, i + $lag) - mu)),
           | CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
      val den = expr(
        """aggregate(transform(sequence(1, CAST(t AS INT)),
          | i -> (element_at(a, i) - mu) * (element_at(a, i) - mu)),
          | CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin)
      round(when(col("t") > lag && den > 0.0, num / den), 6)
    }
    series.select(col("event_type"), col("t").as("n_hours"),
      round(col("mu"), 6).as("mean_hourly"),
      rk(1).as("autocorr_1"), rk(24).as("autocorr_24"))
  }

  def eventsRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val active = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    active.join(cohort, Seq("user_id"))
      .filter(col("day") >= col("cohort_day"))
      .withColumn("cohort_week",
        floor(datediff(col("cohort_day"), lit("2024-01-01").cast("date")) / 7).cast("long"))
      .withColumn("week_offset",
        floor(datediff(col("day"), col("cohort_day")) / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }
}
