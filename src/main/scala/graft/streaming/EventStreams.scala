package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One event routed into the custom-state sessionizer. */
case class SessionEvent(user_id: Long, ts_us: Long, value_c: java.math.BigDecimal)

/** Open-session state carried between micro-batches per user. */
case class OpenSession(startUs: Long, lastUs: Long, n: Long, total: java.math.BigDecimal)

/** A closed session emitted downstream. */
case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, total_value: java.math.BigDecimal)

/** One event routed into the streaming funnel. */
case class FunnelEvent(user_id: Long, ts_us: Long, event_type: String)

/** One interval routed into the streaming interval-union. */
case class IvEvent(user_id: Long, s_us: Long, e_us: Long)

/** Open merged-interval state carried between micro-batches per user. */
case class OpenIv(startUs: Long, endUs: Long, n: Long)

/** A closed merged interval emitted downstream. */
case class ClosedIv(user_id: Long, start_us: Long, end_us: Long,
    span_us: Long, n_merged: Long)

/** One event routed into the streaming rolling window. */
case class RollEvent(user_id: Long, event_id: Long, ts_us: Long,
    value_c: java.math.BigDecimal)

/** Per-user trailing-hour buffer carried between micro-batches. */
case class RollState(ts_us: Seq[Long], values: Seq[java.math.BigDecimal])

/** One rolling-feature row emitted per event. */
case class RollOut(event_id: Long, user_id: Long, ts_us: Long,
    n_last_hour: Long, value_last_hour: java.math.BigDecimal)

/** Per-user funnel progress: first view, first click strictly after
  * it, first purchase strictly after that. Also the state record. */
case class CusumEvent(event_type: String, ts_us: Long)
case class CusumStreamState(curDay: Long, curN: Long, c: Long)
case class CusumOut(event_type: String, day_us: Long, n_events: Long,
  excess: Double, alarm: Boolean)

case class EwmaEvent(event_type: String, ts_us: Long, cents: Long)
/** Open-hour accumulator + the recurrence state (acc = sₜ in cents). */
case class EwmaState(curHour: Long, curN: Long, curCents: Long,
  acc: Double, has: Boolean)
case class EwmaOut(event_type: String, hour_us: Long, n_events: Long,
  hour_value: Double, ewma_value: Double)

/** One event routed into the streaming nearest-as-of. `ts` carries
  * the WATERMARKED timestamp attribute through to the stateful
  * operator — Spark's unsupported-operation checker requires an
  * event-time column in flatMapGroupsWithState's child to allow
  * EventTimeTimeout (unix_micros() strips the watermark metadata, so
  * ts_us alone fails analysis). The step function reads only ts_us. */
case class NearEvent(user_id: Long, event_id: Long, ts_us: Long,
    event_type: String, ts: java.sql.Timestamp)
/** A left event buffered until a signup at ts ≥ its own arrives (its
  * backward candidate frozen at buffer time). */
case class NearPend(event_id: Long, ts_us: Long, event_type: String,
    prev_ts: Long, prev_id: Long, prev_has: Boolean)
/** Per-user deferred-emission state: latest signup seen + the buffer. */
case class NearState(last_ts: Long, last_id: Long, has: Boolean,
    pend: Seq[NearPend])
/** One resolved nearest-as-of row (the batch eventsAsofNearest shape;
  * dt_us > 0 = the signup preceded the event). */
case class NearOut(event_id: Long, user_id: Long, ts_us: Long,
    event_type: String, signup_event_id: Long, dt_us: Long)

/** One event routed into the streaming first-seen tracker. */
case class SeenEvent(user_id: Long, day: Long)
/** Per-user first-seen day — state AND emitted record. */
case class FirstSeen(user_id: Long, first_day: Long)

case class FunnelProgress(user_id: Long, t_view_us: Option[Long],
    t_click_us: Option[Long], t_purchase_us: Option[Long], steps_reached: Long)

/** Structured Streaming forms of the event analytics (SURVEY.md §2.D).
  *
  * Both transforms are expressed on an unbounded DataFrame from
  * `readStream`; the batch equivalents in `queries/Events` share the
  * grouping expressions, and the StreamingSpec asserts batch ≡ stream
  * on a finite input (Trigger.AvailableNow + complete output).
  *
  * At scale: the window agg carries partial aggregates per
  * (window, type) — state is O(open windows × types); the session
  * window keeps per-user open-session state, pruned by the watermark
  * when run in append mode against a live source.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded events source: a parquet directory watched for files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling 1-hour window counts/sums by event type — the streaming
    * twin of Events.eventsWindow. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Hopping 1-hour/15-minute sliding windows by event type — the
    * streaming twin of Events.eventsHopping. The 4× per-event window
    * fan-out happens row-locally before the stateful aggregation, so
    * state size is windows × types, not events. */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").cast("double").as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Gap-based sessions per user via session_window (30-min inactivity
    * gap) — the streaming twin of Events.eventsSessionize. The window
    * end includes the gap padding, so parity compares on
    * (user_id, session_start, n_events, total_value).
    *
    * Gap is 30 min + 1 µs: session_window merges on `diff < gap` while
    * the batch twin merges on `diff <= 30 min`; with µs-quantized
    * timestamps the +1 µs makes the two conventions exactly equal
    * (an exactly-30-minute gap merges in both). */
  def sessionized(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes 1 microsecond").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").cast("double").as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("n_events"), col("total_value"))

  /** Exactly-once on an at-least-once source: dropDuplicates bounded
    * by the watermark. MUST be the WithinWatermark variant — plain
    * dropDuplicates("event_id") keeps state for every key ever seen
    * (the watermark only evicts when the event-time column is part of
    * the dedup key), which is an unbounded state store on an unbounded
    * stream. An event re-delivered more than `horizon` after its first
    * arrival is beyond recovery anyway — that's the delivery contract.
    * Streaming twin of Events.eventsDedup. */
  def deduplicated(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon).dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join with watermarks on BOTH sides: each
    * purchase joins the same user's signups within the preceding hour
    * — streaming attribution. The interval condition plus the two
    * watermarks bound each side's join state (a row is evicted once
    * the other side's watermark passes its interval), so state stays
    * proportional to the horizon, not the stream. Batch twins:
    * events_range (banded pairs) / events_asof (latest-prior). */
  def attributed(events: DataFrame, window: String = "1 hour",
      horizon: String = "2 hours"): DataFrame = {
    // the watermark must out-last the attribution window plus allowed
    // lateness, or signup state is evicted before a late purchase's
    // lookback closes and the pair is silently unattributed
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", horizon)
    val signups = events.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"),
        col("ts").as("signup_ts"))
      .withWatermark("signup_ts", horizon)
    purchases.join(signups,
      col("user_id") === col("s_user") &&
        col("signup_ts") <= col("purchase_ts") &&
        col("signup_ts") >= col("purchase_ts") - expr(s"INTERVAL $window"))
      .select(col("purchase_id"), col("signup_id"), col("user_id"),
        col("purchase_ts"), col("signup_ts"))
  }

  /** Streaming volume-anomaly scoring — the twin of
    * Events.eventsAnomaly in its PRODUCTION shape: per-type hourly
    * baselines (mean / variance moments) come from a static table the
    * batch pipeline maintains over history, and the stream scores each
    * closing hourly window against that baseline as the watermark
    * passes it. State is O(open windows × types); the baseline join is
    * a broadcast per micro-batch, so a refreshed baseline table is
    * picked up without restart. */
  def anomalyScored(events: DataFrame, stats: DataFrame,
      lateness: String = "2 hours"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(stats), Seq("event_type"))
      .withColumn("mean_cnt", col("sc").cast("double") / col("n_hours").cast("double"))
      .withColumn("z", round(
        (col("cnt").cast("double") - col("mean_cnt")) /
          (sqrt(col("var_num").cast("double")) / col("n_hours").cast("double")), 6))
      .filter(abs(col("z")) > 2)
      .select(col("event_type"), col("w.start").as("hr"), col("cnt"),
        round(col("mean_cnt"), 6).as("mean_cnt"), col("z"))

  /** Streaming last-touch attribution — the twin of
    * Events.eventsAttribution: a stream-stream time-interval join
    * (clicks within the hour before each purchase) chained into a
    * windowed per-purchase argmax. Both stateful operators run in one
    * append-mode query — the interval condition plus watermarks bound
    * the join state, and the downstream max() finalizes a purchase's
    * attribution when the watermark passes its window. The argmax is
    * a lexicographic max over (click_us, click_id) packed into one
    * struct, the commutative form a streaming partial-merge needs. */
  def lastTouch(events: DataFrame, window_ : String = "1 hour",
      horizon: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", horizon)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", horizon)
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $window_"))
      .groupBy(window(col("purchase_ts"), "1 hour"),
        col("purchase_id"), col("user_id"))
      .agg(max(struct(unix_micros(col("click_ts")).as("click_us"),
        col("click_id"))).as("best"))
      .select(col("purchase_id"), col("user_id"),
        col("best.click_id").as("click_id"), col("best.click_us").as("click_us"))
  }

  /** Streaming cohort retention — the twin of Events.eventsRetention.
    * The per-user cohort assignment is a STATIC table the batch
    * pipeline maintains (a user's first-signup day only changes when a
    * brand-new user appears); the stream joins it broadcast per
    * micro-batch, derives the cohort cell, and counts users EXACTLY via
    * the dedup-then-count shape: streaming aggregation cannot run
    * COUNT(DISTINCT), so the distinct becomes dropDuplicates state
    * keyed (user, cohort_week, week_offset) feeding a plain count.
    * State is O(users × active week-offsets) — a production deployment
    * bounds it with dropDuplicatesWithinWatermark over the event day.
    * Complete output: every cohort cell updates as users activate. */
  def retention(events: DataFrame, cohort: DataFrame): DataFrame =
    events.select(col("user_id"), to_date(col("ts")).as("day"))
      .join(broadcast(cohort), Seq("user_id"))
      .filter(col("day") >= col("cohort_day"))
      .withColumn("cohort_week",
        floor(datediff(col("cohort_day"), lit("2024-01-01").cast("date")) / 7).cast("long"))
      .withColumn("week_offset",
        floor(datediff(col("day"), col("cohort_day")) / 7).cast("long"))
      .dropDuplicates("user_id", "cohort_week", "week_offset")
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))

  /** The stateful core of Events.eventsGapfill as a stream: per-user
    * hourly counts/sums via a tumbling window (window.start ≡ the
    * batch date_trunc). The grid + forward-fill finishing step needs an
    * ordered window over the WHOLE timeline — not a streaming shape —
    * so it runs as `gapfillFinish` over the sunk hourly table: the
    * standard streaming-agg → sink → batch-view split, with the
    * expensive per-event work done incrementally in the stream. */
  def hourlyActivity(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("hr_value"))
      .select(col("user_id"), col("w.start").as("hr"), col("n_events"), col("hr_value"))

  /** Batch finishing view over the hourly table `hourlyActivity` sinks:
    * the same distributed grid + LOCF as Events.eventsGapfill. */
  def gapfillFinish(hourly: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hr")).as("hr_min"), max(col("hr")).as("hr_max"))
      .select(col("user_id"),
        explode(sequence(col("hr_min"), col("hr_max"), expr("interval 1 hour"))).as("hr"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("filled_value",
        last(col("hr_value"), ignoreNulls = true).over(w).cast("double"))
      .select(col("user_id"), col("hr"), col("n_events"), col("filled_value"))
  }

  /** Stream-static enrichment: every micro-batch joins the unbounded
    * stream against a static dimension (broadcast — re-resolved per
    * batch, so a dimension refresh is picked up without restart). The
    * standard shape for attaching reference data to a live stream. */
  def enriched(events: DataFrame, dim: DataFrame, streamKey: String, dimKey: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim),
      events(streamKey) === dim(dimKey))

  /** Streaming funnel (view → click → purchase) via
    * mapGroupsWithState: per-user progress survives micro-batches and
    * each batch emits the user's updated funnel row (Update mode).
    * State is three optional timestamps per user — O(users), pruned
    * by a state-store TTL in a production deployment.
    *
    * Contract: exact under per-key in-order delivery (the guarantee a
    * Kafka key-partitioned source provides). Each funnel field is
    * written once, in order — a late-arriving EARLIER view cannot
    * retroactively unlock clicks that preceded the view we already
    * accepted (that would require retaining every event, not a
    * constant-size state). StreamingSpec asserts parity with the
    * batch plan both single-batch and across chronological slices. */
  def funnelProgress(spark: SparkSession, events: DataFrame): Dataset[FunnelProgress] = {
    import spark.implicits._

    def step(userId: Long, rows: Iterator[FunnelEvent],
        state: GroupState[FunnelProgress]): FunnelProgress = {
      var s = state.getOption.getOrElse(FunnelProgress(userId, None, None, None, 0L))
      for (e <- rows.toSeq.sortBy(_.ts_us)) e.event_type match {
        case "view" if s.t_view_us.isEmpty =>
          s = s.copy(t_view_us = Some(e.ts_us))
        case "click" if s.t_click_us.isEmpty && s.t_view_us.exists(_ < e.ts_us) =>
          s = s.copy(t_click_us = Some(e.ts_us))
        case "purchase" if s.t_purchase_us.isEmpty && s.t_click_us.exists(_ < e.ts_us) =>
          s = s.copy(t_purchase_us = Some(e.ts_us))
        case _ =>
      }
      s = s.copy(steps_reached =
        Seq(s.t_view_us, s.t_click_us, s.t_purchase_us).takeWhile(_.isDefined).size.toLong)
      state.update(s)
      s
    }

    events
      .filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(step)
  }

  /** Streaming first-seen maintenance — the state behind a live
    * events_newusers dashboard: one epoch-day long per user in
    * mapGroupsWithState, merged by MIN. Min-merge is commutative and
    * idempotent, so the final state is exact under ANY slicing or
    * replay order (a stronger contract than the funnel's in-order
    * requirement — asserted across out-of-order micro-batches in
    * StreamingSpec). Each batch emits the user's current first-seen
    * day (Update mode); the day-cell aggregation and cumulative curve
    * are the batch finisher over this table. */
  def firstSeen(spark: SparkSession, events: DataFrame): Dataset[FirstSeen] = {
    import spark.implicits._

    def step(userId: Long, rows: Iterator[SeenEvent],
        state: GroupState[FirstSeen]): FirstSeen = {
      val batchMin = rows.map(_.day).min
      val s = FirstSeen(userId,
        state.getOption.map(p => math.min(p.first_day, batchMin)).getOrElse(batchMin))
      state.update(s)
      s
    }

    events
      .filter(col("ts").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .as[SeenEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(step)
  }

  /** Streaming twin of Events.eventsRolling: per-user trailing-hour
    * count/sum emitted per event via flatMapGroupsWithState. State is
    * ONE HOUR of (ts, value) per user — bounded by the user's hourly
    * event rate, never by history — pruned as each event advances the
    * frame. Timestamp ties are processed as a peer group before
    * emission, matching the batch RANGE frame's peer-inclusive
    * semantics exactly.
    *
    * Contract: exact under per-key in-order delivery with timestamp
    * peers arriving in the same micro-batch (a Kafka key-partitioned
    * source with time-ordered production provides both); the
    * chronological-slice parity test exercises three batches. */
  def rollingHour(spark: SparkSession, events: DataFrame): Dataset[RollOut] = {
    import spark.implicits._
    val HourUs = 3600L * 1000000

    def step(userId: Long, rows: Iterator[RollEvent],
        state: GroupState[RollState]): Iterator[RollOut] = {
      // local (not an object member): the closure must not capture the
      // enclosing singleton, which is not serializable
      def chunkByTs(sorted: Seq[RollEvent]): Seq[Seq[RollEvent]] =
        if (sorted.isEmpty) Nil
        else sorted.foldLeft(Vector.empty[Vector[RollEvent]]) { (acc, e) =>
          if (acc.nonEmpty && acc.last.head.ts_us == e.ts_us)
            acc.init :+ (acc.last :+ e)
          else acc :+ Vector(e)
        }
      var ts = state.getOption.map(_.ts_us.toVector).getOrElse(Vector.empty)
      var vs = state.getOption.map(_.values.toVector).getOrElse(Vector.empty)
      val out = Vector.newBuilder[RollOut]
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      // process equal-ts runs together: RANGE frames are peer-inclusive
      for (peers <- chunkByTs(sorted)) {
        val t = peers.head.ts_us
        peers.foreach { e => ts :+= e.ts_us; vs :+= e.value_c }
        val keep = ts.indices.filter(i => ts(i) >= t - HourUs)
        ts = keep.map(ts).toVector; vs = keep.map(vs).toVector
        val n = ts.length.toLong
        // an all-null frame sums to NULL, matching the batch window sum
        // (and the DuckDB oracle) — not zero
        val nonNull = vs.filter(_ != null)
        val sum = if (nonNull.isEmpty) null
          else nonNull.reduce((a, v) => a.add(v))
        peers.foreach(e => out += RollOut(e.event_id, userId, e.ts_us, n, sum))
      }
      state.update(RollState(ts, vs))
      out.result().iterator
    }

    events
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value").cast("decimal(18,2)").as("value_c"))
      .as[RollEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  /** Streaming twin of AsOfJoin.eventsAsofNearest's FORWARD half — the
    * deferred-emission buffer the batch scaladoc declared future work:
    * a left event cannot resolve "nearest signup, before or after"
    * until the future is bounded, so each left row is BUFFERED with its
    * backward candidate frozen, and resolves the moment the FIRST
    * signup at ts ≥ its own arrives — any later signup is strictly
    * farther, so that first one decides the forward side and the
    * row-local |Δt| pick (tie → backward, the merge_asof rule) is
    * final.
    *
    * The buffer is ALSO flushed backward-only by an event-time timeout
    * at the watermark: once the watermark W passes a buffered left far
    * enough that its frozen backward distance ≤ W − ts (any future
    * signup sits ≥ W − ts away, and ties go backward), the backward
    * pick is final and the row emits — bit-identical to what the
    * first-future-signup path would later decide, just earlier, so
    * state does not accumulate for users who never sign up again. The
    * only rows that wait indefinitely are pre-first-signup events of
    * users with NO signup at all (they have no candidate on either
    * side — there is nothing to emit); the parity test brackets the
    * output between the resolvable batch rows and the full batch
    * output, so a flush in any batch position stays green.
    *
    * State per user: the latest signup (scalar) + the buffer of lefts
    * since that signup — bounded by the user's event rate between
    * signups, never by history. Simultaneous-timestamp semantics match
    * the batch window ordering (_src sorts right first): a signup at
    * the left row's own ts resolves it at distance 0, and concurrent
    * signups at one ts dedup to max event_id, the batch right-side
    * dedup rule.
    *
    * Contract: per-key in-order delivery with timestamp peers in one
    * micro-batch (the chronological-slice parity test exercises
    * three). */
  def nearestSignup(spark: SparkSession, events: DataFrame): Dataset[NearOut] = {
    import spark.implicits._

    def step(userId: Long, rows: Iterator[NearEvent],
        state: GroupState[NearState]): Iterator[NearOut] = {
      if (state.hasTimedOut) {
        // watermark flush: backward-final rows emit (see scaladoc)
        val st = state.getOption.getOrElse(NearState(0L, 0L, has = false, Nil))
        val wUs = state.getCurrentWatermarkMs() * 1000L
        val (fin, rest) = st.pend.partition(p =>
          p.prev_has && p.ts_us - p.prev_ts <= wUs - p.ts_us)
        state.update(st.copy(pend = rest))
        if (rest.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
        return fin.iterator.map(p =>
          NearOut(p.event_id, userId, p.ts_us, p.event_type,
            p.prev_id, p.ts_us - p.prev_ts))
      }
      def chunkByTs(sorted: Seq[NearEvent]): Seq[Seq[NearEvent]] =
        if (sorted.isEmpty) Nil
        else sorted.foldLeft(Vector.empty[Vector[NearEvent]]) { (acc, e) =>
          if (acc.nonEmpty && acc.last.head.ts_us == e.ts_us)
            acc.init :+ (acc.last :+ e)
          else acc :+ Vector(e)
        }
      var st = state.getOption.getOrElse(NearState(0L, 0L, has = false, Nil))
      var pend = st.pend.toVector
      val out = Vector.newBuilder[NearOut]
      def resolve(p: NearPend, nextTs: Long, nextId: Long): NearOut = {
        val dPrev = p.ts_us - p.prev_ts
        val dNext = nextTs - p.ts_us
        if (p.prev_has && dPrev <= dNext)
          NearOut(p.event_id, userId, p.ts_us, p.event_type, p.prev_id, dPrev)
        else
          NearOut(p.event_id, userId, p.ts_us, p.event_type, nextId, -dNext)
      }
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      for (peers <- chunkByTs(sorted)) {
        val t = peers.head.ts_us
        // concurrent signups dedup to max event_id (the batch rule)
        val signup = peers.filter(_.event_type == "signup")
          .map(_.event_id).maxOption
        signup.foreach { sid =>
          // first signup ≥ their ts: every buffered left resolves now
          pend.foreach(p => out += resolve(p, t, sid))
          pend = Vector.empty
        }
        peers.foreach { e =>
          signup match {
            case Some(sid) => out += resolve(
              NearPend(e.event_id, e.ts_us, e.event_type,
                st.last_ts, st.last_id, st.has), t, sid)
            case None => pend :+= NearPend(e.event_id, e.ts_us, e.event_type,
              st.last_ts, st.last_id, st.has)
          }
        }
        signup.foreach(sid => st = st.copy(last_ts = t, last_id = sid, has = true))
      }
      state.update(st.copy(pend = pend))
      // re-arm on every call (event-time timeouts are not sticky):
      // fire as soon as the watermark next advances past this batch's
      if (pend.nonEmpty)
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
      out.result().iterator
    }

    events
      .filter(col("ts").isNotNull)
      // the watermark drives ONLY the flush timeout; the 1 h delay is
      // cross-key slack (the delivery contract is per-key in-order,
      // not globally ordered)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("ts"))
      .as[NearEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step)
  }

  /** Streaming twin of Events.eventsEwma — the incremental sₜ
    * maintenance the batch operator's scaladoc points at: per event
    * type the state is ONE open hour's accumulator plus the scalar
    * recurrence value (constant size per key at any scale), and a
    * completed hour emits the moment a later-hour event arrives,
    * applying the identical halving step sₜ = (sₜ₋₁ + xₜ)/2 the batch
    * fold replays — so emitted doubles are bit-equal to batch rows.
    * The final open hour stays in state (parity test: batch minus each
    * type's last hour).
    *
    * Contract: per-key in-order delivery across micro-batches (the
    * chronological-slice parity test exercises three). */
  def ewmaHourly(spark: SparkSession, events: DataFrame): Dataset[EwmaOut] = {
    import spark.implicits._
    val HourUs = 3600L * 1000000

    def step(eventType: String, rows: Iterator[EwmaEvent],
        state: GroupState[EwmaState]): Iterator[EwmaOut] = {
      def round6(x: Double): Double =
        java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      var st = state.getOption.getOrElse(EwmaState(Long.MinValue, 0L, 0L, 0.0, has = false))
      val out = Vector.newBuilder[EwmaOut]
      def finalizeHour(): Unit = if (st.curHour != Long.MinValue) {
        val acc = if (!st.has) st.curCents.toDouble
          else (st.acc + st.curCents.toDouble) / 2.0
        out += EwmaOut(eventType, st.curHour * HourUs, st.curN,
          st.curCents.toDouble / 100.0, round6(acc / 100.0))
        st = EwmaState(Long.MinValue, 0L, 0L, acc, has = true)
      }
      for (e <- rows.toSeq.sortBy(_.ts_us)) {
        val hour = e.ts_us / HourUs
        // enforce the per-key in-order contract ACROSS batches: an
        // event whose hour precedes the open state hour would rewind
        // curHour and silently corrupt both the bucket and the
        // recurrence — fail loudly instead of folding it in
        if (st.curHour != Long.MinValue && hour < st.curHour)
          throw new IllegalStateException(
            s"ewmaHourly[$eventType]: out-of-order event hour $hour < open hour " +
              s"${st.curHour} violates the per-key in-order delivery contract")
        if (st.curHour != Long.MinValue && hour > st.curHour) finalizeHour()
        st = st.copy(curHour = hour, curN = st.curN + 1, curCents = st.curCents + e.cents)
      }
      state.update(st)
      out.result().iterator
    }

    events
      .filter(col("ts").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[EwmaEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  /** Streaming twin of Events.eventsCusum — Page's CUSUM is the
    * archetypal SEQUENTIAL detector, so the streaming form is the
    * recursion itself: per type, C closes with each completed day as
    * C ← max(0, C + q·x − p) against a supplied reference rate p/q
    * (events per day as an exact rational — in production a trained
    * baseline; the parity spec feeds the batch operator's own T/D so
    * the two replay bit-identically). Zero-volume gap days emit too
    * (C decays by p each), exactly like the batch spine. The final
    * open day stays in state; out-of-order delivery across batches
    * throws (the ewmaHourly contract).
    *
    * Scale shape: state is three longs per event type; each
    * micro-batch sorts only its own per-key slice. */
  def cusumDaily(spark: SparkSession, events: DataFrame,
      ref: Map[String, (Long, Long)]): Dataset[CusumOut] = {
    import spark.implicits._
    val DayUs = 86400L * 1000000

    def step(eventType: String, rows: Iterator[CusumEvent],
        state: GroupState[CusumStreamState]): Iterator[CusumOut] = {
      val (p, q) = ref.getOrElse(eventType, (0L, 1L))
      def round6(x: Double): Double =
        java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      var st = state.getOption.getOrElse(CusumStreamState(Long.MinValue, 0L, 0L))
      val out = Vector.newBuilder[CusumOut]
      def closeDay(): Unit = {
        val c2 = math.max(0L, st.c + q * st.curN - p)
        out += CusumOut(eventType, st.curDay * DayUs, st.curN,
          round6(c2.toDouble / q.toDouble), c2 > p)
        st = CusumStreamState(st.curDay + 1, 0L, c2)
      }
      for (e <- rows.toSeq.sortBy(_.ts_us)) {
        val day = e.ts_us / DayUs
        if (st.curDay == Long.MinValue) st = st.copy(curDay = day)
        if (day < st.curDay)
          throw new IllegalStateException(
            s"cusumDaily[$eventType]: out-of-order event day $day < open day " +
              s"${st.curDay} violates the per-key in-order delivery contract")
        while (st.curDay < day) closeDay()
        st = st.copy(curN = st.curN + 1)
      }
      state.update(st)
      out.result().iterator
    }

    events
      .filter(col("ts").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[CusumEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  private val GapUs = 1800L * 1000000

  /** Microsecond-precise epoch→Timestamp (the ms constructor drops µs). */
  private def usToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000000 * 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  /** Custom-state sessionization via flatMapGroupsWithState: per-user
    * open-session state survives micro-batches; a >30-min gap closes
    * and emits the session. The pattern for session logic Spark's
    * built-in session_window can't express (e.g. value-dependent gaps,
    * mid-session triggers). The final open session per user stays in
    * state awaiting more data — correct streaming semantics for an
    * unbounded source. */
  /** Streaming twin of Events.intervalMerge: per-user open merged
    * interval in flatMapGroupsWithState; an arriving interval that
    * starts at or before the open union's end extends it, one that
    * starts past the end CLOSES the union (emits it) and opens a new
    * one. The final open union per user stays in state awaiting more
    * data — the same open-tail semantics as sessionizedCustomState,
    * and exactly the live form of coverage tracking (device-connected
    * time, lease windows). Contract: exact under per-key in-order
    * delivery (the Kafka key-partition guarantee); the interval
    * duration rule is the batch operator's own (5 + event_id mod 55
    * minutes), applied before routing. */
  def intervalUnion(spark: SparkSession, events: DataFrame): Dataset[ClosedIv] = {
    import spark.implicits._

    def step(userId: Long, rows: Iterator[IvEvent],
        state: GroupState[OpenIv]): Iterator[ClosedIv] = {
      val sorted = rows.toSeq.sortBy(e => (e.s_us, e.e_us))
      var open = state.getOption
      val closed = Seq.newBuilder[ClosedIv]
      for (e <- sorted) {
        open match {
          case Some(s) if e.s_us <= s.endUs =>
            open = Some(OpenIv(math.min(s.startUs, e.s_us),
              math.max(s.endUs, e.e_us), s.n + 1))
          case Some(s) =>
            closed += ClosedIv(userId, s.startUs, s.endUs,
              s.endUs - s.startUs, s.n)
            open = Some(OpenIv(e.s_us, e.e_us, 1))
          case None =>
            open = Some(OpenIv(e.s_us, e.e_us, 1))
        }
      }
      open.foreach(state.update)
      closed.result().iterator
    }

    events
      .filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("s_us"),
        (unix_micros(col("ts")) +
          (lit(5L) + pmod(col("event_id"), lit(55))) * 60000000L).as("e_us"))
      .as[IvEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  def sessionizedCustomState(spark: SparkSession, events: DataFrame): Dataset[ClosedSession] = {
    import spark.implicits._

    val zero = java.math.BigDecimal.ZERO
    def plus(total: java.math.BigDecimal, v: java.math.BigDecimal) =
      if (v == null) total else total.add(v) // null value counts the event, adds nothing

    def step(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us))
      var open = state.getOption
      val closed = Seq.newBuilder[ClosedSession]
      for (e <- sorted) {
        open match {
          // data arriving more than a gap BEFORE the open session can
          // never belong to it (merging would manufacture a session
          // with an internal gap > GapUs, breaking the invariant and
          // batch parity); it closes immediately as its own session —
          // the bounded price of single-open-session state
          case Some(s) if e.ts_us < s.startUs - GapUs =>
            closed += ClosedSession(userId, usToTs(e.ts_us), usToTs(e.ts_us),
              1, plus(zero, e.value_c))
          // late data within a gap of the stored session still merges,
          // widening boundaries with min/max instead of walking lastUs
          // backwards
          case Some(s) if e.ts_us - s.lastUs <= GapUs =>
            open = Some(OpenSession(math.min(s.startUs, e.ts_us),
              math.max(s.lastUs, e.ts_us), s.n + 1, plus(s.total, e.value_c)))
          case Some(s) =>
            closed += ClosedSession(userId, usToTs(s.startUs), usToTs(s.lastUs), s.n, s.total)
            open = Some(OpenSession(e.ts_us, e.ts_us, 1, plus(zero, e.value_c)))
          case None =>
            open = Some(OpenSession(e.ts_us, e.ts_us, 1, plus(zero, e.value_c)))
        }
      }
      open.foreach(state.update)
      closed.result().iterator
    }

    events
      .filter(col("ts").isNotNull) // a null ts has no place on a timeline
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value").cast("decimal(18,2)").as("value_c"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }
}
