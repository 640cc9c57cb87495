package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{BloomPrune, Graph, Profile, Sampling, Scd, Search, Tokenize}
import graft.queries.{Events, Relational, Stats}

/** Semantic checks for the round-4 third wave: warehouse maintenance
  * (SCD2, MERGE), grouped statistics, CUBE, time-series gapfill and
  * anomaly detection, bloom-pruned joins, reservoir sampling, BM25
  * ranking, and triangle counting. */
class WarehouseOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q_cube covers all four grouping sets, grand total matches orders") {
    val rows = Relational.qCube(spark, sf).collect()
    val nOrders = graft.sources.Tables.orders(spark, sf).count()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand.head.getLong(2) == nOrders)
    // both one-sided margins present, and each margin sums to the total
    val segOnly = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val prioOnly = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1))
    assert(segOnly.map(_.getLong(2)).sum == nOrders)
    assert(prioOnly.map(_.getLong(2)).sum == nOrders)
  }

  test("q_corr agrees with Spark's built-in corr to 1e-6") {
    val got = Stats.qCorr(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val ref = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        stddev_samp(col("l_quantity")).as("sd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, (c, cv, sd)) =>
      assert(math.abs(c - ref(k)._1) < 1e-6, s"corr $k")
      assert(math.abs(cv - ref(k)._2) / math.abs(ref(k)._2) < 1e-6, s"covar $k")
      assert(math.abs(sd - ref(k)._3) / ref(k)._3 < 1e-6, s"stddev $k")
    }
  }

  test("scd2_dim versions are contiguous, intervals chain, one current row per key") {
    val rows = Scd.scd2Dim(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.get(3), Option(r.get(4)), r.getBoolean(5)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (key, vs) =>
      val sorted = vs.toSeq.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to sorted.length).toSeq, s"versions $key")
      // exactly the last version is current (open valid_to)
      assert(sorted.count(_._6) == 1 && sorted.last._6, s"current flag $key")
      // no consecutive versions share a status (they'd not be changes)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._3 != b._3, s"adjacent same-status versions for $key")
          // interval chains: valid_to of v equals valid_from of v+1
          assert(a._5.contains(b._4), s"interval chain $key")
        case _ =>
      }
    }
  }

  test("merge_upsert applies update/insert/delete/keep arbitration") {
    val out = Scd.mergeUpsert(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getString(3), r.getString(4)))
      .toMap
    assert(!out.values.exists(_._4 == "delete"), "deletes must not survive")
    val inserts = out.filter(_._2._4 == "insert")
    assert(inserts.nonEmpty)
    inserts.foreach { case (k, (name, bal, seg, _)) =>
      assert(k >= 1000000000000L && seg == "PROSPECT" && bal == 0.0 && name == s"Prospect#$k")
    }
    // spot-check an update: acctbal = base + open-order spend, exact at 2dp
    val base = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).toMap
    val delta = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("d"))
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    val updated = out.filter(_._2._4 == "update").take(50)
    assert(updated.nonEmpty)
    updated.foreach { case (k, (_, bal, _, _)) =>
      val expect = base(k) + delta.getOrElse(k, BigDecimal(0))
      assert((BigDecimal(bal) - expect).abs < BigDecimal("0.005"), s"acctbal $k")
    }
  }

  test("agg_incremental partial merge equals direct aggregation bit-for-bit") {
    val merged = Scd.aggIncremental(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // direct single-pass aggregation over the raw events, same cents
    // discipline — must agree EXACTLY (==, not tolerance): that is the
    // algebraic-merge contract the incremental pattern relies on
    val direct = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), org.apache.spark.sql.functions.to_date(col("ts")).as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count_distinct(col("day")).as("nd"),
        sum(col("cents")).as("s"), min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      .collect()
      .map { r =>
        val (n, s) = (r.getLong(1), r.getLong(3))
        r.getString(0) -> (n, r.getLong(2), s.toDouble / 100.0,
          r.getLong(4).toDouble / 100.0, r.getLong(5).toDouble / 100.0,
          BigDecimal(s.toDouble / (n * 100).toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toMap
    assert(merged.keySet == direct.keySet)
    merged.foreach { case (t, m) => assert(m == direct(t), s"type $t: $m vs ${direct(t)}") }
  }

  test("events_anomaly flags exactly the >2-sigma hours") {
    val hourly = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    val byType = hourly.groupBy(_._1)
    // note .toSeq first: flatMap on a Map of pair results would rebuild
    // a Map keyed by event type and collapse to one hour per type
    val expected = byType.toSeq.flatMap { case (t, hs) =>
      val n = hs.length.toDouble
      val mean = hs.map(_._3).sum / n
      val varPop = hs.map(h => (h._3 - mean) * (h._3 - mean)).sum / n
      val sd = math.sqrt(varPop)
      // round to 6 decimals BEFORE the threshold, exactly as the
      // operator does — a raw-z compare would disagree for any hour
      // with |z| in (2, 2.0000005)
      def r6(z: Double) = BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (sd == 0) Seq.empty[(String, java.sql.Timestamp)]
      else hs.toSeq.filter(h => math.abs(r6((h._3 - mean) / sd)) > 2.0).map(h => (t, h._2))
    }.toSet
    val got = Events.eventsAnomaly(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty || expected.isEmpty)
  }

  test("events_mad flags exactly the >3-MAD hours against a local replay") {
    val hourly = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * 0.5
      val lo = s(h.toInt)
      val hi = s(math.ceil(h).toInt)
      lo + (hi - lo) * (h - h.toInt)
    }
    val expected = hourly.groupBy(_._1).toSeq.flatMap { case (t, hs) =>
      val med = medianOf(hs.map(_._3.toDouble).toSeq)
      val mad = medianOf(hs.map(h => math.abs(h._3 - med)).toSeq)
      if (mad <= 0) Seq.empty
      else hs.toSeq.filter(h => math.abs(h._3 - med) > 3 * mad).map(h => (t, h._2))
    }.toSet
    val got = Events.eventsMad(spark, sf).collect()
    assert(got.map(r => (r.getString(0), r.getTimestamp(1))).toSet == expected)
    // robust_z restates (cnt - med) / (MadK * mad), rounded to 6
    got.foreach { r =>
      val z = (r.getLong(2) - r.getDouble(3)) / (Events.MadK * r.getDouble(4))
      val r6 = BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) == r6)
      assert(math.abs(r.getLong(2) - r.getDouble(3)) > 3 * r.getDouble(4))
    }
  }

  test("q_histogram_eq buckets cover every row exactly once per column") {
    val rows = Profile.histogramEquiHeight(spark, sf).collect()
    val li = graft.sources.Tables.lineitem(spark, sf)
    val n = li.count()
    rows.groupBy(_.getString(0)).foreach { case (c, bs) =>
      assert(bs.length == Profile.EqBuckets)
      // buckets partition the value range: total count equals the table
      assert(bs.map(_.getAs[Long]("n")).sum == n, s"$c counts don't cover")
      // boundaries are non-decreasing and chain lo(k+1) == hi(k)
      val sorted = bs.sortBy(_.getAs[Long]("bucket"))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Double]("hi") == b.getAs[Double]("lo"))
        assert(a.getAs[Double]("lo") <= a.getAs[Double]("hi"))
      }
      // equi-height within interpolation slack: no bucket is empty
      // unless its boundaries collapse
      sorted.foreach { r =>
        if (r.getAs[Double]("lo") < r.getAs[Double]("hi"))
          assert(r.getAs[Long]("n") > 0)
      }
    }
  }

  test("events_forecast evaluates the holdout week against the train profile") {
    val rows = Events.eventsForecast(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_train_hours") > 0)
      assert(r.getAs[Long]("n_test_hours") > 0)
      assert(r.getAs[Double]("mae_model") >= 0 && r.getAs[Double]("mae_base") >= 0)
      if (!r.isNullAt(r.fieldIndex("skill"))) {
        val skill = BigDecimal(1.0 - r.getAs[Double]("mae_model") / r.getAs[Double]("mae_base"))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("skill") == skill)
      }
    }
    // the split leaves at most a week of observed test hours per type
    rows.foreach(r => assert(r.getAs[Long]("n_test_hours") <= Events.FcTestHours))
  }

  test("events_pattern matches a local CEP replay") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val hourUs = 3600L * 1000000
    val byUser = ev.groupBy(_._2)
    val expected = byUser.toSeq.flatMap { case (_, rows) =>
      val views = rows.filter(_._3 == "view")
      val clicks = rows.filter(_._3 == "click")
      rows.filter(_._3 == "purchase").flatMap { p =>
        val cand = views.filter(v => v._4 <= p._4 && p._4 - v._4 <= hourUs)
        if (cand.isEmpty) None
        else {
          val latest = cand.maxBy(v => (v._4, v._1))
          val blocked = clicks.exists(c => c._4 > latest._4 && c._4 < p._4)
          if (blocked) None else Some((p._1, latest._1))
        }
      }
    }.toSet
    val got = Events.eventsPattern(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("events_gapfill grids are dense per user and LOCF-filled") {
    val rows = Events.eventsGapfill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, hs) =>
      val sorted = hs.toSeq.sortBy(_._2)
      // dense hourly grid: consecutive rows are exactly 1h apart
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b._2 - a._2 == 3600000L, s"gap in grid for user $u")
        case _ =>
      }
      // first and last grid hours are observed (min/max of actual activity)
      assert(sorted.head._3 > 0 && sorted.last._3 > 0)
      // LOCF: a silent hour carries the previous filled value
      sorted.sliding(2).foreach {
        case Seq(a, b) if b._3 == 0 => assert(b._4 == a._4, s"LOCF break for user $u")
        case _ =>
      }
    }
  }

  test("bloom_prune equals the plain exact join (false positives all die)") {
    val got = BloomPrune.bloomPrune(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val li = graft.sources.Tables.lineitem(spark, sf)
    val dim = graft.sources.Tables.part(spark, sf).filter(col("p_brand") === "Brand#1")
    val plain = li.join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Money.sumFixed(graft.functions.Money.discPriceE4, 10000L, 4)
          .cast("double").as("rev"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == plain)
  }

  test("sample_group returns exactly min(K, stratum size) rows per language") {
    val got = Sampling.sampleGroup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sizes = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang.keySet == sizes.keySet)
    byLang.foreach { case (l, n) =>
      assert(n == math.min(Sampling.ReservoirK.toLong, sizes(l)), s"stratum $l")
    }
    // determinism: a second run picks the identical sample
    val again = Sampling.sampleGroup(spark, sf).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
  }

  test("bm25_rank returns top-10 relevant docs per query") {
    val got = Search.bm25Rank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet == Search.bm25Queries.map(_._1).toSet)
    val texts = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    byQuery.foreach { case (qid, rows) =>
      assert(rows.length <= Search.TopN)
      assert(rows.forall(_._3 > 0))
      val terms = Search.bm25Queries.toMap.apply(qid).toSet
      // every ranked doc actually contains at least one query term
      rows.foreach { case (_, d, _) => assert(texts(d).intersect(terms).nonEmpty, s"$qid doc $d") }
      // and no unranked doc scores above the weakest ranked one on raw
      // term presence count when the list is full (sanity, not exact BM25)
      if (rows.length == Search.TopN) {
        val ranked = rows.map(_._2).toSet
        val minScore = rows.map(_._3).min
        assert(minScore > 0)
        assert(ranked.size == rows.length, "no duplicate docs in a ranking")
      }
    }
  }

  test("events_attribution picks the latest click within the hour, per purchase") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // independent model: clicks deduped per (user, ts) to max id
    val clicks = ev.filter(_._3 == "click")
      .groupBy(e => (e._2, e._4)).map { case ((u, t), es) => (u, t, es.map(_._1).max) }
      .toSeq.groupBy(_._1)
    val expected = ev.filter(_._3 == "purchase").flatMap { case (pid, u, _, pus) =>
      clicks.getOrElse(u, Nil)
        .filter(c => c._2 <= pus && pus - c._2 <= 3600L * 1000000)
        .sortBy(c => (-c._2, -c._3)).headOption
        .map(c => pid -> ((u, pus, c._3, c._2, pus - c._2)))
    }.toMap
    val got = Events.eventsAttribution(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("vocab_coverage ranks by frequency with monotone coverage") {
    val rows = Tokenize.vocabCoverage(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(_._3)
    assert(rows.nonEmpty && rows.length <= Tokenize.VocabSize)
    assert(rows.map(_._3) == (1L to rows.length).toSeq)
    // counts non-increasing along rank; coverage strictly increasing, <= 1
    rows.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._2 >= b._2, "counts must be rank-ordered")
        assert(a._4 < b._4 && b._4 <= 1.0 + 1e-12)
      case _ =>
    }
    // spot-check the top term against a direct count
    val direct = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t")).filter(col("t") =!= "")
      .groupBy(col("t")).count().orderBy(col("count").desc, col("t")).first()
    assert(rows.head._1 == direct.getString(0) && rows.head._2 == direct.getLong(1))
  }

  test("class_balance entropy/gini match an independent model") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1))).groupBy(_._1)
    val got = Profile.classBalance(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (src, rows) =>
      val n = rows.length.toDouble
      val byLang = rows.groupBy(_._2).view.mapValues(_.length).toMap
      val ps = (Profile.balanceLangs.map(l => byLang.getOrElse(l, 0)) :+
        (rows.length - Profile.balanceLangs.map(l => byLang.getOrElse(l, 0)).sum))
        .filter(_ > 0).map(_ / n)
      val entropy = ps.map(p => -p * math.log(p)).sum
      val gini = 1.0 - ps.map(p => p * p).sum
      val r = got(src)
      assert(r.getLong(1) == rows.length)
      assert(math.abs(r.getDouble(8) - entropy) < 1e-5, s"entropy $src")
      assert(math.abs(r.getDouble(9) - gini) < 1e-5, s"gini $src")
    }
  }

  test("assoc_rules metrics reconstruct from exact counts") {
    val rows = graft.operators.Basket.assocRules(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nab, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nab >= graft.operators.Basket.MinSupport && nab <= math.min(na, nb))
      assert(r.getDouble(6) == nab.toDouble / na)
      assert(r.getDouble(7) == nab.toDouble / nb)
      assert(r.getDouble(8) > 0)
    }
    // a known pair count from a direct recount
    val items = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    items.values.foreach { o =>
      val pks = o.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- i + 1 until pks.length) pairCount((pks(i), pks(j))) += 1
    }
    val expected = pairCount.filter(_._2 >= graft.operators.Basket.MinSupport).toMap
    val got = rows.map(r =>
      (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")) -> r.getAs[Long]("n_ab")).toMap
    assert(got == expected, s"sizes got=${got.size} exp=${expected.size}")
  }

  test("pareto_front equals the quadratic dominance filter") {
    val parts = graft.sources.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val expected = parts.filter { case (_, p, s) =>
      !parts.exists { case (_, q, t) =>
        q <= p && t >= s && (q < p || t > s)
      }
    }.map(_._1).toSet
    val got = graft.operators.Skyline.paretoFront(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("dq_checks reports every rule with exact counts") {
    val got = graft.operators.Quality.dqChecks(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set("lineitem_quantity_null", "lineitem_price_nonpositive",
      "lineitem_discount_range", "customer_key_unique", "events_props_unparsable",
      "orders_custkey_fk", "lineitem_orderkey_fk"))
    got.values.foreach { case (v, n) => assert(v >= 0 && n > 0 && v <= n) }
    // independent recount of the FK rule
    val custKeys = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val orphans = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey")).collect().map(_.getLong(0))
      .count(k => !custKeys.contains(k))
    assert(got("orders_custkey_fk")._1 == orphans)
  }

  test("pipeline_tokens composes filter ∩ sample with HT weights") {
    val rows = Sampling.pipelineTokens(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.nonEmpty)
    val kept = graft.operators.TextMetrics.corpusFilter(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val sampled = Sampling.sampleStratified(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byLang = sampled.filter(s => kept(s._1)).groupBy(_._2)
    assert(rows.keySet == byLang.keySet)
    byLang.foreach { case (l, docs) =>
      val (nDocs, sumTok, est) = rows(l)
      assert(nDocs == docs.length, s"doc count $l")
      // weights ≥ 2 (rates ≤ 5 of 10): the estimate upscales the sample
      assert(est >= sumTok.toDouble, s"HT estimate must upscale $l")
      assert(est == sumTok.toDouble * docs.head._3, s"est = sum × weight $l")
    }
  }

  test("graph_pagerank matches an in-memory integer replay") {
    val S = Graph.PrScale
    val edges0 = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 25)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).values.flatMap { o =>
        val pks = o.map(_._2).distinct.sorted
        for (i <- pks.indices; j <- i + 1 until pks.length) yield (pks(i), pks(j))
      }.toSet
    val directed = edges0.toSeq.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    val deg = directed.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size.toLong
    var pr = deg.map { case (id, _) => id -> (S / n) }
    for (_ <- 1 to Graph.PrIters) {
      val contrib = pr.map { case (id, p) => id -> p / deg(id) }
      val inSum = directed.groupBy(_._2).view
        .mapValues(_.map(e => contrib(e._1)).sum).toMap
      pr = pr.map { case (id, _) =>
        id -> ((3L * (S / n)) / 20L + (17L * inSum.getOrElse(id, 0L)) / 20L)
      }
    }
    val got = Graph.graphPagerank(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == pr)
    // mass sanity: total rank stays within rounding slack of SCALE
    val total = got.values.sum
    assert(math.abs(total - S) < S / 100, s"rank mass drifted: $total")
  }

  test("graphPagerankConverged reaches fixpoint with bounded lineage") {
    val (ranks, rounds) = Graph.graphPagerankConverged(spark, sf, checkpointEvery = 2)
    assert(rounds < 60, "must converge before the round cap")
    assert(rounds > 2, "probe graph needs more than one checkpoint block")
    // converged ranks must be a fixpoint of the gate row's recurrence:
    // more unrolled iterations from the same start can't beat the
    // threshold by much — compare against the 3-iter static unroll on
    // shared high-degree vertices only loosely; the strong property is
    // mass conservation and stability under one more step
    val total = ranks.agg(org.apache.spark.sql.functions.sum(col("pr_scaled"))).head().getLong(0)
    val S = Graph.PrScale
    // integer floor divisions leak a few units per node per round; the
    // total must stay within a couple percent of the initial mass
    assert(math.abs(total - S) < S / 50, s"rank mass drifted: $total vs $S")
    // bounded lineage: the converged plan must hang off a checkpointed
    // RDD scan, not a rounds-deep join tree
    val logical = ranks.queryExecution.analyzed.toString
    assert(logical.contains("LogicalRDD") || logical.contains("Scan ExistingRDD"),
      s"expected checkpoint-truncated lineage, got:\n$logical")
    assert("Join".r.findAllIn(logical).size <= 2,
      "lineage must not accumulate one join per round")
  }

  test("graph_triangles matches a brute-force count on sf0.001") {
    val items = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 25)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { order =>
      val pks = order.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- i + 1 until pks.length) yield (pks(i), pks(j))
    }.toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj.getOrElse(b, Set.empty) if adj.getOrElse(a, Set.empty)(c)) {
      triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
    }
    val expected = triCount.filter(_._2 > 0).toMap
    val got = Graph.graphTriangles(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("graph_clustering composes triangles/degrees into Watts-Strogatz coefficients") {
    val tri = Graph.graphTriangles(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Graph.graphClustering(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, deg, t) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(t == tri.getOrElse(v, 0L), s"vertex $v triangle count")
      if (deg < 2) assert(r.isNullAt(3), s"vertex $v cc must be null at degree $deg")
      else {
        val cc = r.getDouble(3)
        val exp = BigDecimal(2.0 * t / (deg.toDouble * (deg - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(cc - exp) < 1e-9, s"vertex $v cc")
        assert(cc >= 0.0 && cc <= 1.0 + 1e-9, s"vertex $v cc out of range")
      }
    }
  }

  test("audience_overlap equals a literal set-intersection replay") {
    val tu = graft.sources.Tables.events(spark, sf)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sets = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = graft.operators.Experiment.audienceOverlap(spark, sf).collect()
    val types = sets.keys.toSeq.sorted
    assert(rows.length == types.size * (types.size - 1) / 2, "full pair spine")
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val (sa, sb) = (sets(a), sets(b))
      val inter = (sa & sb).size.toLong
      assert(r.getLong(2) == sa.size && r.getLong(3) == sb.size)
      assert(r.getLong(4) == inter, s"pair ($a,$b) intersection")
      val exp = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - exp) < 1e-9, s"pair ($a,$b) jaccard")
    }
  }

  test("snapshot_diff replays the md5 mutation and emits a complete changelog") {
    import graft.expressions.CrossHash
    val p20 = CrossHash.P / 20
    val p10 = CrossHash.P / 10
    val v1 = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = v1.filter { case (k, _) => CrossHash.md5Mod(s"del-$k") >= p20 }
    val v2 = kept.map { case (k, c) =>
      k -> (if (CrossHash.md5Mod(s"upd-$k") < p10) c + c / 20 else c)
    } ++ kept.collect { case (k, c) if CrossHash.md5Mod(s"ins-$k") < p20 =>
      (k + 1000000000000L) -> c
    }
    val expected = (v1.keySet ++ v2.keySet).flatMap { k =>
      (v1.get(k), v2.get(k)) match {
        case (None, Some(_)) => Some(k -> "insert")
        case (Some(_), None) => Some(k -> "delete")
        case (Some(a), Some(b)) if a != b => Some(k -> "update")
        case _ => None
      }
    }.toMap
    val got = Scd.snapshotDiff(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected)
    // all three actions must occur, and round-trip holds: v1 + diff = v2
    assert(Set("insert", "delete", "update").subsetOf(got.values.toSet))
    val rebuilt = (v1 -- got.collect { case (k, "delete") => k }) ++
      v2.view.filterKeys(k => got.get(k).exists(a => a == "insert" || a == "update"))
    assert(rebuilt == v2, "applying the derived changelog must reproduce v2")
  }

  test("q_range_frame trailing window follows value distance, not row count") {
    val daily = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("p"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy("p", "day").agg(sum(col("c")).as("cents")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rows = Relational.qRangeFrame(spark, sf).collect()
    assert(rows.length == daily.size)
    rows.foreach { r =>
      val (p, day) = (r.getString(0), r.getLong(1))
      val win = daily.collect { case ((`p`, d), c) if d >= day - 6 && d <= day => c }
      assert(math.abs(r.getDouble(3) - win.sum.toDouble / 100.0) < 1e-6, s"$p/$day trail")
      assert(r.getLong(4) == win.size.toLong, s"$p/$day window days")
    }
    // the value-distance semantics must be visible: some window spans
    // fewer than 7 days even deep into the series (a gap day shrank it)
    val deep = rows.filter(_.getLong(1) > rows.map(_.getLong(1)).min + 10)
    assert(deep.exists(_.getLong(4) < 7), "no gap-shrunk window: rows-frame would suffice")
  }

  private def copurchaseEdges(): Set[(Long, Long)] = {
    val items = graft.sources.Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 25)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    items.groupBy(_._1).values.flatMap { order =>
      val pks = order.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- i + 1 until pks.length) yield (pks(i), pks(j))
    }.toSet
  }

  test("graph_community equals a literal synchronous label-propagation replay") {
    val canon = copurchaseEdges()
    val nbrs = canon.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl: Map[Long, Long] = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to Graph.LpcIters) {
      lbl = nbrs.map { case (v, ns) =>
        v -> ns.groupBy(lbl).view.mapValues(_.size).toSeq
          .maxBy { case (l, c) => (c.toLong, -l) }._1
      }
    }
    val got = Graph.graphCommunity(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lbl)
    // informative partition: neither one giant community nor all-singleton
    val k = got.values.toSet.size
    assert(k > 1 && k < got.size, s"degenerate community count $k of ${got.size}")
  }

  test("graph_modularity terms recompute from the assignment") {
    val canon = copurchaseEdges()
    val lbl = Graph.graphCommunity(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = canon.size.toLong
    val deg = canon.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = Graph.graphModularity(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == lbl.size, "vertex partition covers the graph")
    var q = 0.0
    rows.foreach { r =>
      val c = r.getLong(0)
      val members = lbl.collect { case (v, l) if l == c => v }.toSet
      assert(r.getLong(1) == members.size, s"community $c size")
      val eIn = canon.count { case (a, b) => members(a) && members(b) }.toLong
      assert(r.getLong(2) == eIn, s"community $c internal edges")
      val dSum = members.toSeq.map(deg).sum
      assert(r.getLong(3) == dSum, s"community $c degree mass")
      val exp = BigDecimal(eIn.toDouble / m - (dSum.toDouble / (2.0 * m)) * (dSum.toDouble / (2.0 * m)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - exp) < 2e-6, s"community $c contribution")
      q += r.getDouble(4)
    }
    assert(q > 0.0 && q <= 1.0, s"modularity $q out of range for a detected partition")
  }
}
