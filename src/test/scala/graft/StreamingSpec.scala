package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.queries.Events
import graft.streaming.EventStreams

/** Batch ≡ streaming parity for the event operators: the same finite
  * input produces identical results through readStream (AvailableNow,
  * complete mode) and the batch plans the DuckDB oracle certifies. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    // re-write events as micros-timestamp parquet (the raw testdata is
    // TIMESTAMP(NANOS), which the file stream source can't type)
    graft.sources.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    dir
  }

  private def runToSet(df: org.apache.spark.sql.DataFrame, name: String): Set[String] = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name).collect().map(_.mkString("|")).toSet
  }

  private def runToSetAppend(df: org.apache.spark.sql.DataFrame, name: String): Set[String] = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // the BigDecimal encoder widens to DECIMAL(38,18); renormalize to
    // the batch twin's terminal double
    spark.table(name).withColumn("total_value",
        col("total_value").cast("decimal(18,2)").cast("double"))
      .collect().map(_.mkString("|")).toSet
  }

  test("stream-static dimension join equals batch join") {
    val nation = graft.sources.Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long").as("nkey"), col("n_name"))
    val streamed = runToSetAppendRaw(
      EventStreams.enriched(
        EventStreams.readEvents(spark, streamDir).withColumn("ukey", pmod(col("user_id"), lit(25))),
        nation, "ukey", "nkey")
        .select(col("event_id"), col("n_name")), "enrich_stream")
    val batch = graft.sources.Tables.events(spark, sf)
      .withColumn("ukey", pmod(col("user_id"), lit(25)))
      .join(nation, col("ukey") === col("nkey"))
      .select(col("event_id"), col("n_name"))
      .collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
  }

  private def runToSetAppendRaw(df: org.apache.spark.sql.DataFrame, name: String): Set[String] = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name).collect().map(_.mkString("|")).toSet
  }

  test("streaming tumbling-window agg equals batch") {
    val streamed = runToSet(
      EventStreams.windowedAgg(EventStreams.readEvents(spark, streamDir)), "win_stream")
    val batch = Events.eventsWindow(spark, sf).collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
  }

  test("streaming hopping-window agg equals batch") {
    val streamed = runToSet(
      EventStreams.hoppingAgg(EventStreams.readEvents(spark, streamDir)), "hop_stream")
    val batch = Events.eventsHopping(spark, sf).collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
  }

  test("append mode with watermark emits exactly the closed windows") {
    val streamed = runToSetAppendRaw(
      EventStreams.windowedAgg(
        EventStreams.readEvents(spark, streamDir).withWatermark("ts", "1 hour")),
      "win_append")
    // with AvailableNow the final watermark = max(ts) - 1h: windows
    // ending after it are withheld as still-open — everything emitted
    // must match batch, and only the trailing windows may be absent
    val batch = Events.eventsWindow(spark, sf).collect().map(_.mkString("|")).toSet
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= batch.size - 24) // at most the last day's open tail differs
    assert(streamed.nonEmpty)
  }

  test("flatMapGroupsWithState sessionizer emits every closed session") {
    import org.apache.spark.sql.expressions.Window
    val streamed = runToSetAppend(
      EventStreams.sessionizedCustomState(spark,
        EventStreams.readEvents(spark, streamDir)).toDF(), "sess_fmgws")
    // batch truth minus each user's final session (still open in state)
    val w = Window.partitionBy(col("user_id"))
    val batch = Events.eventsSessionize(spark, sf)
      .withColumn("last_session", max(col("session_num")).over(w))
      .filter(col("session_num") =!= col("last_session"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
      .collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
  }

  test("streaming interval union emits every closed merged interval, single and sliced") {
    import org.apache.spark.sql.expressions.Window
    // batch truth minus each user's final interval (still open in state)
    val w = Window.partitionBy(col("user_id"))
    val truth = Events.intervalMerge(spark, sf)
      .withColumn("last_iv", max(col("interval_no")).over(w))
      .filter(col("interval_no") =!= col("last_iv"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("span_us"), col("n_merged"))
      .collect().map(_.mkString("|")).toSet
    val single = runToSetAppendRaw(
      EventStreams.intervalUnion(spark,
        EventStreams.readEvents(spark, streamDir)).toDF(), "iv_single")
    assert(single == truth)
    val src = chronologicalSource("ivu", Seq("2024-01-10", "2024-01-20"))
    val sliced = runToSetAppendRaw(
      EventStreams.intervalUnion(spark, src).toDF(), "iv_sliced")
    assert(sliced == truth)
  }

  test("streaming dropDuplicates gives exactly-once over a re-delivering source") {
    // a source that re-delivers: the same events parquet written twice
    val dupDir = java.nio.file.Files.createTempDirectory("graft_dup").toString
    val ev = graft.sources.Tables.events(spark, sf)
    ev.write.mode("overwrite").parquet(dupDir)
    ev.write.mode("append").parquet(dupDir)
    val streamed = runToSetAppendRaw(
      EventStreams.deduplicated(EventStreams.readEvents(spark, dupDir))
        .select(col("event_id")), "dedup_stream")
    val batch = ev.select(col("event_id")).collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
  }

  test("streaming anomaly scoring against a batch baseline equals batch anomalies") {
    // the baseline table the batch pipeline would maintain: per-type
    // moments over the full history (the same ones eventsAnomaly uses)
    val stats = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("cnt")).as("sc"),
        sum(col("cnt") * col("cnt")).as("scc"))
      .withColumn("var_num", col("n_hours") * col("scc") - col("sc") * col("sc"))
      .filter(col("var_num") > 0)
    val streamed = runToSetAppendRaw(
      EventStreams.anomalyScored(EventStreams.readEvents(spark, streamDir), stats),
      "anomaly_stream")
    val batchDf = Events.eventsAnomaly(spark, sf)
    val batchAll = batchDf.collect().map(_.mkString("|")).toSet
    // append mode never emits windows still inside the final watermark
    // horizon (max ts - 2h), so parity is two-sided containment: the
    // stream emits only batch rows, and every batch row safely past
    // the horizon (window end <= max ts - 3h, 1h slack) was emitted
    val maxTs = graft.sources.Tables.events(spark, sf).agg(max(col("ts"))).first().getTimestamp(0)
    val cutoff = new java.sql.Timestamp(maxTs.getTime - 3L * 3600 * 1000)
    val batchOld = batchDf.filter(col("hr") + expr("interval 1 hour") <= lit(cutoff))
      .collect().map(_.mkString("|")).toSet
    assert(streamed.subsetOf(batchAll), "stream must emit only batch anomalies")
    assert(batchOld.subsetOf(streamed), "every safely-old batch anomaly must be emitted")
    assert(batchOld.nonEmpty)
  }

  test("streaming last-touch attribution (join + argmax) equals batch") {
    val streamed = runToSetAppendRaw(
      EventStreams.lastTouch(EventStreams.readEvents(spark, streamDir)),
      "lasttouch_stream")
    val batchDf = Events.eventsAttribution(spark, sf)
      .select(col("purchase_id"), col("user_id"), col("click_id"), col("click_us"),
        col("purchase_us"))
    val render = (r: org.apache.spark.sql.Row) =>
      Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)).mkString("|")
    val batchAll = batchDf.collect().map(render).toSet
    // the chained join→agg propagates watermarks conservatively; only
    // purchases well past the final horizon are guaranteed finalized
    val maxUs = graft.sources.Tables.events(spark, sf)
      .agg(max(unix_micros(col("ts")))).first().getLong(0)
    val batchOld = batchDf.filter(col("purchase_us") <= maxUs - 5L * 3600 * 1000000)
      .collect().map(render).toSet
    assert(streamed.subsetOf(batchAll), "stream must emit only batch attributions")
    assert(batchOld.subsetOf(streamed), "every safely-old attribution must be emitted")
    assert(batchOld.nonEmpty)
  }

  test("stream-stream interval join (attribution) equals the batch join") {
    val streamed = runToSetAppendRaw(
      EventStreams.attributed(EventStreams.readEvents(spark, streamDir)), "attr_stream")
    val ev = graft.sources.Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("s_user"), col("ts").as("signup_ts"))
    val batch = p.join(s,
        col("user_id") === col("s_user") &&
          col("signup_ts") <= col("purchase_ts") &&
          col("signup_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("signup_id"), col("user_id"),
        col("purchase_ts"), col("signup_ts"))
      .collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  /** Batch funnel rendered as (user, view_us, click_us, purchase_us, steps). */
  private def batchFunnel: Set[String] =
    Events.eventsFunnel(spark, sf)
      .select(col("user_id"), unix_micros(col("t_view")), unix_micros(col("t_click")),
        unix_micros(col("t_purchase")), col("steps_reached"))
      .collect().map(_.mkString("|")).toSet

  /** Latest funnel update per user from an update-mode memory sink:
    * progress is monotone in steps_reached and each field is written
    * once, so the max-steps row per user IS the final state. */
  private def finalFunnel(name: String): Set[String] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    spark.table(name)
      .withColumn("max_steps", max(col("steps_reached")).over(w))
      .filter(col("steps_reached") === col("max_steps"))
      .select(col("user_id"), col("t_view_us"), col("t_click_us"),
        col("t_purchase_us"), col("steps_reached"))
      .distinct()
      .collect().map(_.mkString("|")).toSet
  }

  test("mapGroupsWithState funnel equals batch funnel (single batch)") {
    val q = EventStreams.funnelProgress(spark, EventStreams.readEvents(spark, streamDir))
      .toDF().writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(finalFunnel("funnel_stream") == batchFunnel)
  }

  test("mapGroupsWithState funnel equals batch across chronological micro-batches") {
    // three time slices written as separate files, mod-times forced
    // ascending so maxFilesPerTrigger=1 replays them in event order —
    // the per-key in-order delivery the funnel contract assumes
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    val ev = graft.sources.Tables.events(spark, sf)
    val cuts = Seq("2024-01-10", "2024-01-20")
    val slices = Seq(
      ev.filter(col("ts") < cuts(0)),
      ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
      ev.filter(col("ts") >= cuts(1)))
    slices.zipWithIndex.foreach { case (s, i) =>
      val sub = s"$dir/slice_$i"
      s.coalesce(1).write.parquet(sub)
      val dirF = new java.io.File(sub)
      dirF.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val dst = new java.io.File(dir, s"slice_$i.parquet")
        java.nio.file.Files.move(f.toPath, dst.toPath)
        dst.setLastModified(1000000L * (i + 1))
      }
    }
    val src = spark.readStream.schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*.parquet")
    val q = EventStreams.funnelProgress(spark, src)
      .toDF().writeStream.format("memory").queryName("funnel_sliced")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(finalFunnel("funnel_sliced") == batchFunnel)
  }

  private lazy val batchFirstSeen: Set[String] =
    graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
      .collect().map(_.mkString("|")).toSet

  /** Final first-seen state from an update-mode sink: the state is
    * min-merged, so the smallest emission per user IS the final day. */
  private def finalFirstSeen(name: String): Set[String] =
    spark.table(name)
      .groupBy(col("user_id")).agg(min(col("first_day")).as("first_day"))
      .collect().map(_.mkString("|")).toSet

  test("streaming first-seen equals batch first-seen (single batch)") {
    val q = EventStreams.firstSeen(spark, EventStreams.readEvents(spark, streamDir))
      .toDF().writeStream.format("memory").queryName("firstseen_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(finalFirstSeen("firstseen_stream") == batchFirstSeen)
  }

  test("streaming first-seen equals batch under OUT-OF-ORDER micro-batches") {
    // min-merge is commutative + idempotent, so parity must hold even
    // when the slices replay newest-first — write them with REVERSED
    // mod-times so maxFilesPerTrigger=1 delivers them out of order
    val dir = java.nio.file.Files.createTempDirectory("graft_fseen").toString
    val ev = graft.sources.Tables.events(spark, sf)
    val cuts = Seq("2024-01-10", "2024-01-20")
    val slices = Seq(
      ev.filter(col("ts") < cuts(0)),
      ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
      ev.filter(col("ts") >= cuts(1)))
    slices.zipWithIndex.foreach { case (s, i) =>
      val sub = s"$dir/slice_$i"
      s.coalesce(1).write.parquet(sub)
      val dirF = new java.io.File(sub)
      dirF.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val dst = new java.io.File(dir, s"slice_$i.parquet")
        java.nio.file.Files.move(f.toPath, dst.toPath)
        dst.setLastModified(1000000L * (slices.length - i)) // reversed
      }
    }
    val src = spark.readStream.schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*.parquet")
    val q = EventStreams.firstSeen(spark, src)
      .toDF().writeStream.format("memory").queryName("firstseen_ooo")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(finalFirstSeen("firstseen_ooo") == batchFirstSeen)
  }

  test("ewmaHourly and cusumDaily refuse out-of-order delivery loudly") {
    // both operators document a per-key in-order contract; a violated
    // contract must FAIL the query, not fold into corrupt output
    def reversedSource(tag: String): org.apache.spark.sql.DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
      val ev = graft.sources.Tables.events(spark, sf)
      val cuts = Seq("2024-01-10", "2024-01-20")
      val slices = Seq(
        ev.filter(col("ts") < cuts(0)),
        ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
        ev.filter(col("ts") >= cuts(1)))
      slices.zipWithIndex.foreach { case (sl, i) =>
        val sub = s"$dir/slice_$i"
        sl.coalesce(1).write.parquet(sub)
        new java.io.File(sub).listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
          val dst = new java.io.File(dir, s"slice_$i.parquet")
          java.nio.file.Files.move(f.toPath, dst.toPath)
          dst.setLastModified(1000000L * (slices.length - i)) // reversed
        }
      }
      spark.readStream.schema(EventStreams.eventSchema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/*.parquet")
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    val exE = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = EventStreams.ewmaHourly(spark, reversedSource("ewma_ooo")).toDF()
        .writeStream.format("memory").queryName("ewma_ooo")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    assert(messages(exE).exists(_.contains("out-of-order")), messages(exE).mkString(" | "))
    val exC = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = EventStreams.cusumDaily(spark, reversedSource("cusum_ooo"),
          Map.empty).toDF()
        .writeStream.format("memory").queryName("cusum_ooo")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    assert(messages(exC).exists(_.contains("out-of-order")), messages(exC).mkString(" | "))
  }

  test("streaming nearest-as-of resolves each event at the first signup past it, single and sliced") {
    import graft.operators.AsOfJoin
    val ev = graft.sources.Tables.events(spark, sf)
    // The output is BRACKETED, not pinned: a left event resolves the
    // moment a signup at ts ≥ its own arrives (the lower set — every
    // such row MUST emit), and the watermark timeout may additionally
    // flush buffered rows whose backward pick is already final — those
    // must be bit-identical to the full batch row for that event (the
    // upper set). How many flush depends on where the watermark lands
    // per micro-batch, so equality against either set alone is wrong.
    val sgMax = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(max(unix_micros(col("ts"))).as("max_sg"))
    val nearestCols = (df: org.apache.spark.sql.DataFrame) => df
      .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"),
        col("signup_event_id"), col("dt_us"))
      .collect().map(_.mkString("|")).toSet
    val full = AsOfJoin.eventsAsofNearest(spark, sf)
      .withColumn("ts_us", unix_micros(col("ts")))
      .filter(col("signup_event_id").isNotNull)
    val truth = nearestCols(full.join(sgMax, Seq("user_id"))
      .filter(col("max_sg") >= col("ts_us")))
    val upper = nearestCols(full)
    def checkBracket(got: Set[String], tag: String): Unit = {
      assert(truth.subsetOf(got),
        s"$tag: ${(truth -- got).size} resolvable rows missing, e.g. ${(truth -- got).take(3)}")
      assert(got.subsetOf(upper),
        s"$tag: ${(got -- upper).size} rows disagree with batch, e.g. ${(got -- upper).take(3)}")
    }
    val single = runToSetAppendRaw(
      EventStreams.nearestSignup(spark,
        EventStreams.readEvents(spark, streamDir)).toDF(), "near_single")
    checkBracket(single, "single")
    val src = chronologicalSource("near", Seq("2024-01-10", "2024-01-20"))
    val sliced = runToSetAppendRaw(
      EventStreams.nearestSignup(spark, src).toDF(), "near_sliced")
    checkBracket(sliced, "sliced")
    info(s"watermark-flushed extras: single=${(single -- truth).size} " +
      s"sliced=${(sliced -- truth).size} (truth=${truth.size}, upper=${upper.size})")
    // the timeout path must actually run somewhere in this test, or
    // the state-leak fix is unexercised: across both runs at least one
    // buffered row must have watermark-flushed backward-final
    assert(((single -- truth) ++ (sliced -- truth)).nonEmpty,
      "no watermark flush fired in either run — timeout path unexercised")
    assert(truth.nonEmpty)
  }

  /** Events re-written as N chronological slice files with ascending
    * mod-times, plus a maxFilesPerTrigger=1 source replaying them in
    * event order — one micro-batch per slice. */
  private def chronologicalSource(tag: String, cuts: Seq[String]): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    val ev = graft.sources.Tables.events(spark, sf)
    val bounds = Seq(None) ++ cuts.map(Some(_))
    val slices = bounds.zip(cuts.map(Some(_)) ++ Seq(None)).map {
      case (lo, hi) =>
        ev.filter(lo.map(c => col("ts") >= c).getOrElse(lit(true)) &&
          hi.map(c => col("ts") < c).getOrElse(lit(true)))
    }
    slices.zipWithIndex.foreach { case (s, i) =>
      val sub = s"$dir/slice_$i"
      s.coalesce(1).write.parquet(sub)
      new java.io.File(sub).listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val dst = new java.io.File(dir, s"slice_$i.parquet")
        java.nio.file.Files.move(f.toPath, dst.toPath)
        dst.setLastModified(1000000L * (i + 1))
      }
    }
    spark.readStream.schema(EventStreams.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*.parquet")
  }

  test("streaming EWMA maintenance equals batch minus each type's open hour") {
    def batchTruth: Set[String] = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
      Events.eventsEwma(spark, sf)
        .withColumn("hour_us", unix_micros(col("hour")))
        .withColumn("last_hour", max(col("hour_us")).over(w))
        .filter(col("hour_us") =!= col("last_hour"))
        .select(col("event_type"), col("hour_us"), col("n_events"),
          col("hour_value"), col("ewma_value"))
        .collect().map(_.mkString("|")).toSet
    }
    // single batch
    val single = {
      val q = EventStreams.ewmaHourly(spark,
          EventStreams.readEvents(spark, streamDir)).toDF()
        .writeStream.format("memory").queryName("ewma_single")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.table("ewma_single").collect().map(_.mkString("|")).toSet
    }
    assert(single == batchTruth)
    // three chronological micro-batches: completed hours straddling a
    // slice boundary must still finalize with the identical recurrence
    val src = chronologicalSource("ewma", Seq("2024-01-10", "2024-01-20"))
    val q = EventStreams.ewmaHourly(spark, src).toDF()
      .writeStream.format("memory").queryName("ewma_sliced")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("ewma_sliced").collect().map(_.mkString("|")).toSet == batchTruth)
  }

  test("streaming CUSUM equals batch on closed days, single batch and sliced") {
    // reference rate per type = the batch operator's own T/D so the
    // two replay the identical integer recursion
    val raw = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
    val byType = raw.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (d0, d1) = {
      val r = raw.agg(min("day"), max("day")).head(); (r.getLong(0), r.getLong(1))
    }
    val dTotal = d1 - d0 + 1
    val ref = byType.map { case (t, n) => t -> (n, dTotal) }
    // streaming closes a type's day only when a later event arrives:
    // parity set = batch rows within [first event day, last event day)
    val span = raw.groupBy("event_type")
      .agg(min("day").as("fd"), max("day").as("ld")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batchTruth = Events.eventsCusum(spark, sf)
      .withColumn("day_us", expr("unix_date(day) * 86400000000"))
      .select(col("event_type"), col("day_us"), col("n_events"),
        col("excess"), col("alarm"))
      .collect()
      .filter { r =>
        val (fd, ld) = span(r.getString(0))
        val d = r.getLong(1) / 86400000000L
        d >= fd && d < ld
      }.map(_.mkString("|")).toSet
    val single = {
      val q = EventStreams.cusumDaily(spark,
          EventStreams.readEvents(spark, streamDir), ref).toDF()
        .writeStream.format("memory").queryName("cusum_single")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.table("cusum_single").collect().map(_.mkString("|")).toSet
    }
    assert(single == batchTruth)
    val src = chronologicalSource("cusum", Seq("2024-01-10", "2024-01-20"))
    val q = EventStreams.cusumDaily(spark, src, ref).toDF()
      .writeStream.format("memory").queryName("cusum_sliced")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("cusum_sliced").collect().map(_.mkString("|")).toSet == batchTruth)
  }

  test("streaming retention equals batch across chronological micro-batches") {
    // the cohort table is static (batch-maintained first-signup days);
    // the stream replays three time slices in order and the final
    // complete-mode table must be exactly the batch retention matrix
    val cohort = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("cohort_day"))
    val src = chronologicalSource("retention", Seq("2024-01-10", "2024-01-20"))
    val streamed = runToSet(EventStreams.retention(src, cohort), "retention_stream")
    val batch = Events.eventsRetention(spark, sf).collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
  }

  test("streaming gapfill core equals batch hourly; finishing view equals batch gapfill") {
    val src = chronologicalSource("gapfill", Seq("2024-01-10", "2024-01-20"))
    val q = EventStreams.hourlyActivity(src)
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // the production shape sinks the streaming agg to a storage table
    // and runs the finishing view over THAT; round-trip through parquet
    // (a memory-sink view also trips self-join attribute dedup)
    val sunk = java.nio.file.Files.createTempDirectory("graft_hourly").toString
    spark.table("hourly_stream").write.mode("overwrite").parquet(sunk)
    val hourly = spark.read.parquet(sunk)
    // the stateful core matches the batch hourly pre-aggregate exactly
    val batchHourly = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("hr_value"))
    assert(hourly.collect().map(_.mkString("|")).toSet ==
      batchHourly.collect().map(_.mkString("|")).toSet)
    // and the batch finishing view over the sunk table reproduces the
    // full gapfill operator
    val finished = EventStreams.gapfillFinish(hourly)
      .collect().map(_.mkString("|")).toSet
    val batch = Events.eventsGapfill(spark, sf).collect().map(_.mkString("|")).toSet
    assert(finished == batch)
  }

  test("streaming rolling-hour features equal the batch RANGE frame across micro-batches") {
    val src = chronologicalSource("rolling", Seq("2024-01-10", "2024-01-20"))
    val q = EventStreams.rollingHour(spark, src)
      .toDF().writeStream.format("memory").queryName("rolling_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("rolling_stream")
      // BigDecimal encoder widens to (38,18); renormalize to the batch double
      .withColumn("value_last_hour",
        col("value_last_hour").cast("decimal(18,2)").cast("double"))
      .collect().map(_.mkString("|")).toSet
    val batch = Events.eventsRolling(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("n_last_hour"), col("value_last_hour"))
      .collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
  }

  test("file-sink restart resumes from the checkpoint exactly-once") {
    // two launches against the same checkpoint: the first sees only
    // slice 0, the second finds slice 1 appended — the source offsets
    // in the checkpoint make launch 2 process ONLY the new file, and
    // the watermark state recovers so closed windows emit exactly once
    // across the restart (the streaming half of the Restart story)
    val ev = graft.sources.Tables.events(spark, sf)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_restart_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_restart_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_restart_out").toString
    def writeSlice(s: org.apache.spark.sql.DataFrame, i: Int): Unit = {
      val sub = s"$srcDir/stage_$i"
      s.coalesce(1).write.parquet(sub)
      new java.io.File(sub).listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          new java.io.File(srcDir, s"slice_$i.parquet").toPath)
      }
    }
    def launch(): Unit = {
      val q = EventStreams.windowedAgg(
          spark.readStream.schema(EventStreams.eventSchema).parquet(s"$srcDir/*.parquet")
            .withWatermark("ts", "1 hour"))
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    writeSlice(ev.filter(col("ts") < "2024-01-15"), 0)
    launch()
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst > 0, "launch 1 must emit closed windows")
    writeSlice(ev.filter(col("ts") >= "2024-01-15"), 1)
    launch()
    val out = spark.read.parquet(outDir)
    assert(out.count() > afterFirst, "launch 2 must emit the new windows")
    // exactly-once across the restart: no (window, type) emitted twice
    assert(out.groupBy(col("window_start"), col("event_type"))
      .count().filter(col("count") > 1).count() == 0)
    // and everything emitted matches the batch plan on the same data
    val batch = Events.eventsWindow(spark, sf)
      .withColumn("window_start", expr("unix_micros(window_start)"))
      .withColumn("window_end", expr("unix_micros(window_end)"))
      .collect().map(_.mkString("|")).toSet
    val streamed = out
      .withColumn("window_start", expr("unix_micros(window_start)"))
      .withColumn("window_end", expr("unix_micros(window_end)"))
      .collect().map(_.mkString("|")).toSet
    assert(streamed.subsetOf(batch), "restarted stream diverged from batch")
  }

  test("streaming sessionization equals batch") {
    val streamed = runToSet(
      EventStreams.sessionized(EventStreams.readEvents(spark, streamDir)), "sess_stream")
    val batch = Events.eventsSessionize(spark, sf)
      .select(col("user_id"), col("session_start"), col("n_events"), col("total_value"))
      .collect().map(_.mkString("|")).toSet
    assert(streamed == batch)
  }

  /** Batch sketch projected to the streaming twin's columns. */
  private lazy val batchHll: Set[String] =
    graft.operators.Sketch.hllDistinct(spark, sf)
      .select(col("source"), col("n_zero_regs"), col("reg_sum"), col("hll_est"))
      .collect().map(_.mkString("|")).toSet

  /** Last emission per source = the row with the minimal harmonic sum
    * (registers only grow, so reg_sum strictly decreases on change). */
  private def finalHll(name: String): Set[String] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
    spark.table(name)
      .withColumn("min_rs", min(col("reg_sum")).over(w))
      .filter(col("reg_sum") === col("min_rs"))
      .select(col("source"), col("n_zero_regs"), col("reg_sum"), col("hll_est"))
      .distinct()
      .collect().map(_.mkString("|")).toSet
  }

  /** Expected heavy hitters from a batch replay of the CMS cells. */
  private lazy val batchCmsTop: Set[(String, Long)] = {
    import org.apache.spark.sql.DataFrame
    val toks: DataFrame = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .select(col("token"),
        explode(sequence(lit(0), lit(graft.operators.Sketch.Depth - 1))).as("d"))
      .withColumn("bucket", graft.operators.Sketch.cmsBucket(col("token"), col("d")))
    val cells = toks.groupBy(col("d"), col("bucket")).count()
    toks.distinct().join(cells, Seq("d", "bucket"))
      .groupBy(col("token")).agg(min(col("count")).as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, e) => (-e, t) }.take(graft.streaming.DocStreams.CmsTopN).toSet
  }

  private def finalCms(name: String): Set[(String, Long)] = {
    val t = spark.table(name)
    val maxGen = t.agg(max(col("gen"))).collect()(0).getLong(0)
    t.filter(col("gen") === maxGen)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("cms_est"))).toSet
  }

  test("streaming CMS heavy hitters converge to the batch cells (single batch)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    graft.sources.Tables.documents(spark, sf).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.DocStreams
      .cmsHeavyHitters(spark, graft.streaming.DocStreams.readDocs(spark, dir))
      .toDF().writeStream.format("memory").queryName("cms_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(finalCms("cms_stream") == batchCmsTop)
  }

  test("streaming CMS cells merge across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cms2").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
      .zipWithIndex.foreach { case (s, i) =>
        val sub = s"$dir/slice_$i"
        s.coalesce(1).write.parquet(sub)
        new java.io.File(sub).listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
          val dst = new java.io.File(dir, s"slice_$i.parquet")
          java.nio.file.Files.move(f.toPath, dst.toPath)
          dst.setLastModified(1000000L * (i + 1))
        }
      }
    val src = spark.readStream.schema(graft.streaming.DocStreams.docSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*.parquet")
    val q = graft.streaming.DocStreams.cmsHeavyHitters(spark, src)
      .toDF().writeStream.format("memory").queryName("cms_sliced")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(finalCms("cms_sliced") == batchCmsTop)
  }

  test("streaming HLL sketch registers converge to the batch sketch (single batch)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    graft.sources.Tables.documents(spark, sf).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.DocStreams
      .hllSketch(spark, graft.streaming.DocStreams.readDocs(spark, dir))
      .toDF().writeStream.format("memory").queryName("hll_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(finalHll("hll_stream") == batchHll)
  }

  test("streaming HLL sketch merges register state across micro-batches") {
    // two doc_id-sliced files replayed as separate micro-batches: the
    // second batch must MERGE into (not replace) the first's registers
    val dir = java.nio.file.Files.createTempDirectory("graft_docs2").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
      .zipWithIndex.foreach { case (s, i) =>
        val sub = s"$dir/slice_$i"
        s.coalesce(1).write.parquet(sub)
        new java.io.File(sub).listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
          val dst = new java.io.File(dir, s"slice_$i.parquet")
          java.nio.file.Files.move(f.toPath, dst.toPath)
          dst.setLastModified(1000000L * (i + 1))
        }
      }
    val src = spark.readStream.schema(graft.streaming.DocStreams.docSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*.parquet")
    val q = graft.streaming.DocStreams.hllSketch(spark, src)
      .toDF().writeStream.format("memory").queryName("hll_sliced")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(finalHll("hll_sliced") == batchHll)
  }

  private lazy val batchMhSig: Set[String] =
    graft.operators.Sketch.sourceSignature(
        graft.operators.Sketch.sourceTokens(spark, sf))
      .select(col("source"), col("i"), col("m"))
      .collect().map(_.mkString("|")).toSet

  /** Final signature from the append-mode sink: highest generation per
    * source carries the converged minima. */
  private def finalMhSig(name: String): Set[String] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
    spark.table(name)
      .withColumn("maxg", max(col("gen")).over(w))
      .filter(col("gen") === col("maxg"))
      .select(col("source"), col("i"), col("m"))
      .collect().map(_.mkString("|")).toSet
  }

  test("streaming minhash signature equals batch under doc-sliced micro-batches") {
    // two doc_id slices in REVERSED mod-time order: min-merge is
    // commutative + idempotent, so even out-of-order delivery must
    // converge to the batch signature
    val dir = java.nio.file.Files.createTempDirectory("graft_docs3").toString
    val docs = graft.sources.Tables.documents(spark, sf)
    Seq(docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
      .zipWithIndex.foreach { case (s, i) =>
        val sub = s"$dir/slice_$i"
        s.coalesce(1).write.parquet(sub)
        new java.io.File(sub).listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
          val dst = new java.io.File(dir, s"slice_$i.parquet")
          java.nio.file.Files.move(f.toPath, dst.toPath)
          dst.setLastModified(1000000L * (2 - i)) // reversed
        }
      }
    val src = spark.readStream.schema(graft.streaming.DocStreams.docSchema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*.parquet")
    val q = graft.streaming.DocStreams.minhashSignature(spark, src)
      .toDF().writeStream.format("memory").queryName("mh_sliced")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(finalMhSig("mh_sliced") == batchMhSig)
  }
}
