package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Fingerprint, Layout, Profile, Tokenize}
import graft.queries.Events

/** Semantic checks for the round-4 analytics operators: funnel,
  * retention, profiling, BPE pair counting, exact-13-gram
  * decontamination, z-order layout. */
class AnalyticsOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("events_funnel steps are ordered and monotone per user") {
    val rows = Events.eventsFunnel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, c, p) = (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))
      val steps = r.getLong(4)
      // a later step implies every earlier step
      if (p.isDefined) assert(c.isDefined && v.isDefined)
      if (c.isDefined) assert(v.isDefined)
      // timestamps strictly increase along the funnel
      for (a <- v; b <- c)
        assert(a.asInstanceOf[java.sql.Timestamp].before(b.asInstanceOf[java.sql.Timestamp]))
      for (a <- c; b <- p)
        assert(a.asInstanceOf[java.sql.Timestamp].before(b.asInstanceOf[java.sql.Timestamp]))
      assert(steps == Seq(v, c, p).takeWhile(_.isDefined).size)
    }
  }

  test("events_funnel matches a per-user scala fold") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      .groupBy(_._1)
    val expected = ev.map { case (u, rows) =>
      val sorted = rows.sortBy(_._3.getTime)
      val v = sorted.collectFirst { case (_, "view", t) => t }
      val c = v.flatMap(tv => sorted.collectFirst { case (_, "click", t) if t.after(tv) => t })
      val p = c.flatMap(tc => sorted.collectFirst { case (_, "purchase", t) if t.after(tc) => t })
      u -> ((v, c, p))
    }
    val got = Events.eventsFunnel(spark, sf).collect().map { r =>
      r.getLong(0) -> ((Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3))))
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (u, e) => assert(got(u) == e, s"user $u") }
  }

  test("events_retention: week-0 cell counts every cohort user; offsets bounded") {
    val rows = Events.eventsRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    // every signup user is active in their own week 0 (the signup event itself)
    val cohorts = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("d"))
      .withColumn("w", floor(datediff(col("d"), lit("2024-01-01").cast("date")) / 7))
      .groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    cohorts.foreach { case (w, n) =>
      assert(rows((w, 0L)) == n, s"cohort week $w should retain all $n users at offset 0")
    }
    // the corpus spans ~1 month: offsets can never exceed 5 weeks
    rows.keys.foreach { case (_, off) => assert(off >= 0 && off <= 5) }
  }

  test("col_profile matches direct aggregates, one row per column") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val got = Profile.colProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("l_orderkey", "l_partkey", "l_suppkey"))
    val n = li.count()
    for ((c, r) <- got) {
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == 0)
      assert(r.getLong(3) == li.select(c).distinct().count())
      assert(r.getLong(4) == li.agg(min(col(c))).head().getLong(0))
      assert(r.getLong(5) == li.agg(max(col(c))).head().getLong(0))
      assert(r.getLong(6) == li.agg(sum(col(c))).head().getLong(0))
    }
  }

  test("k_anonymity bands replay from a literal QI grouping") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map { r =>
        val cents = BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100
        (r.getLong(0), r.getString(1), math.floor(cents.toLong / 100000.0).toLong)
      }
    val ks = cust.groupBy(identity).values.map(_.size.toLong).toSeq
    def band(k: Long): Long =
      if (k == 1) 1L else if (k <= 4) 2L else if (k <= 9) 5L else if (k <= 19) 10L else 20L
    val expGroups = ks.groupBy(band).view.mapValues(_.size.toLong).toMap
    val expRows = ks.groupBy(band).view.mapValues(_.sum).toMap
    val rows = Profile.kAnonymity(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == expGroups.keySet)
    var share = 0.0
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(2) == expGroups(b), s"band $b group count")
      assert(r.getLong(3) == expRows(b), s"band $b row mass")
      share += r.getDouble(4)
    }
    assert(math.abs(share - 1.0) < 1e-4, "row shares partition the table")
    assert(rows.map(_.getLong(3)).sum == cust.length.toLong)
  }

  test("l_diversity histogram replays from a literal per-group distinct count") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map { r =>
        val cents = BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100
        ((r.getLong(0), math.floor(cents.toLong / 10000.0).toLong), r.getString(1))
      }
    val groups = cust.groupBy(_._1).values
      .map(g => (g.map(_._2).distinct.size.toLong, g.size.toLong)).toSeq
    val expGroups = groups.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expRows = groups.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val rows = Profile.lDiversity(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == expGroups.keySet)
    rows.foreach { r =>
      val l = r.getLong(0)
      assert(r.getLong(1) == expGroups(l), s"l=$l group count")
      assert(r.getLong(2) == expRows(l), s"l=$l row mass")
    }
    assert(rows.map(_.getLong(2)).sum == cust.length.toLong)
    // the audit must see real diversity variation, not a constant column
    assert(rows.length >= 2, "degenerate: every QI group has identical l")
  }

  test("approx profile ndv within HLL tolerance of exact") {
    val exact = Profile.colProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val row = Profile.approxProfile(spark, sf).head()
    for ((c, ndv) <- exact) {
      val approx = row.getLong(row.fieldIndex(s"ndv_$c"))
      assert(math.abs(approx - ndv).toDouble / ndv < 0.1, s"$c: $approx vs $ndv")
    }
  }

  test("bpe_pairs counts pairs weighted by word frequency, deterministic top-k") {
    val rows = Tokenize.bpePairs(spark, sf).collect()
    assert(rows.length == 50)
    // sorted by (cnt desc, pair asc)
    val pairs = rows.map(r => (r.getString(0), r.getLong(1)))
    assert(pairs.sliding(2).forall { case Array((p1, c1), (p2, c2)) =>
      c1 > c2 || (c1 == c2 && p1 < p2) })
    // spot-check one pair against a scala count
    val docs = graft.sources.Tables.documents(spark, sf).select("text").collect()
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { r =>
      r.getString(0).split(" ").filter(_.length >= 2).foreach { w =>
        (0 until w.length - 1).foreach { i =>
          val p = w.substring(i, i + 2)
          counts(p) = counts.getOrElse(p, 0L) + 1
        }
      }
    }
    pairs.foreach { case (p, c) => assert(counts(p) == c, s"pair $p") }
  }

  test("decontaminate flags exactly the train docs sharing a 13-gram with eval") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
    def grams(toks: Array[String]): Set[String] =
      if (toks.length < 13) Set.empty
      else (0 to toks.length - 13).map(i => toks.slice(i, i + 13).mkString(" ")).toSet
    val evalGrams = docs.filter(_._1 % 37 == 0).flatMap(d => grams(d._2)).toSet
    val expected = docs.filter(_._1 % 37 != 0).map { case (id, toks) =>
      id -> grams(toks).count(evalGrams.contains)
    }.toMap
    val got = Fingerprint.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, n) =>
      assert(got(id) == ((n.toLong, n > 0)), s"doc $id")
    }
  }

  test("zorder buckets cover narrow rectangles, not random slices") {
    val rows = Layout.zorderLayout(spark, sf).collect()
    assert(rows.length > 16)
    val pSpan = rows.map(r => r.getLong(3) - r.getLong(2)).max
    val sSpan = rows.map(r => r.getLong(5) - r.getLong(4)).max
    val (pAll, sAll) = {
      val li = graft.sources.Tables.lineitem(spark, sf)
        .agg(max(col("l_partkey")) - min(col("l_partkey")),
          max(col("l_suppkey")) - min(col("l_suppkey"))).head()
      (li.getLong(0), li.getLong(1))
    }
    // top-6-bit z buckets = 8x8 grid: each bucket spans at most ~1/8th
    // of each dimension (plus one scaling cell of slack)
    assert(pSpan <= pAll / 8 + pAll / 64 + 1, s"part span $pSpan of $pAll")
    assert(sSpan <= sAll / 8 + sAll / 64 + 1, s"supp span $sSpan of $sAll")
    // and the buckets partition the table
    val n = rows.map(_.getLong(1)).sum
    assert(n == graft.sources.Tables.lineitem(spark, sf).count())
  }

  test("inverted_index: df counts every posting, lists capped and sorted, bounded-heap plan") {
    val out = graft.operators.Index.invertedIndex(spark, sf)
    assert(out.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
      "postings cap must run through the bounded-heap operator, not a window sort")
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
    val model = scala.collection.mutable.Map.empty[String, List[Long]]
    docs.foreach { r =>
      r.getString(1).split(" ").filter(_.nonEmpty).distinct.foreach { t =>
        model(t) = r.getLong(0) :: model.getOrElse(t, Nil)
      }
    }
    val got = out.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got.keySet == model.keySet)
    model.foreach { case (t, ids) =>
      val sorted = ids.sorted
      assert(got(t)._1 == sorted.size, s"df of $t")
      assert(got(t)._2 == sorted.take(graft.operators.Index.PostingsCap).mkString(","),
        s"postings of $t")
    }
  }

  test("q_pivot cells partition the orders table") {
    val rows = graft.queries.Relational.qPivot(spark, sf).collect()
    val total = rows.map(r => (1 to 5).map(r.getLong).sum).sum
    assert(total == graft.sources.Tables.orders(spark, sf).count())
    // one spot cell against a direct filter
    val urgentO = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "O" && col("o_orderpriority") === "1-URGENT").count()
    val rowO = rows.find(_.getString(0) == "O").get
    assert(rowO.getLong(1) == urgentO)
  }

  test("q_quantiles matches a sorted-array interpolation model") {
    val got = graft.queries.Relational.qQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (1 to 5).map(r.getDouble)).toMap
    val li = graft.sources.Tables.lineitem(spark, sf)
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey")) {
      val v = li.select(c).collect().map(_.getLong(0)).sorted
      val expect = Seq(0.125, 0.25, 0.5, 0.75, 0.875).map { q =>
        val pos = (v.length - 1) * q
        val lo = pos.toInt
        val g = pos - lo
        if (lo + 1 < v.length) v(lo) * (1 - g) + v(lo + 1) * g else v(lo).toDouble
      }
      assert(got(c) == expect, s"quantiles of $c")
    }
  }

  test("q_setops equals scala set arithmetic") {
    val cust = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 9000).select("c_nationkey")
      .collect().map(_.getInt(0).toLong).toSet
    val supp = graft.sources.Tables.supplier(spark, sf)
      .filter(col("s_acctbal") > 9000).select("s_nationkey")
      .collect().map(_.getInt(0).toLong).toSet
    val got = graft.queries.Relational.qSetOps(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val expect = (cust & supp).map(_ -> true).toMap ++ (cust -- supp).map(_ -> false).toMap
    assert(got == expect)
  }

  test("zorder write path: repartitionByRange on z keeps per-file extents tight") {
    import org.apache.spark.sql.functions.spark_partition_id
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"))
      .withColumn("z", Layout.zval(col("l_partkey"), col("l_suppkey")))
    val parts = li.repartitionByRange(8, col("z"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(max(col("l_partkey")) - min(col("l_partkey")))
    // every range partition (file, on a real writer) spans less than
    // the full partkey domain — the pruning property z-order buys
    val full = li.agg(max(col("l_partkey")) - min(col("l_partkey"))).head().getLong(0)
    parts.collect().foreach(r => assert(r.getLong(1) < full))
  }

  test("zonemap_prune: z-order footers prune, insertion-order footers do not") {
    val rows = Layout.zonemapPrune(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
    assert(rows.length == 32, "2 layouts x 2 columns x 8 predicates")
    rows.foreach { case ((lay, pc, idx), (v, nf, ns, pr)) =>
      assert(nf > 0 && ns >= 0 && ns <= nf, s"$lay/$pc/$idx file counts")
      assert(math.abs(pr - (1.0 - ns.toDouble / nf)) < 1e-6, s"$lay/$pc/$idx ratio")
    }
    def avgPrune(lay: String, pc: String): Double = {
      val g = rows.filter { case ((l, c, _), _) => l == lay && c == pc }
      g.map(_._2._4).sum / g.length
    }
    Seq("partkey", "suppkey").foreach { pc =>
      assert(avgPrune("zorder", pc) > avgPrune("linear", pc) + 0.3,
        s"z-order must out-prune insertion order on $pc")
    }
  }
}
