package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Experiment, Layout, Sampling, TextMetrics}
import graft.queries.Events

/** Semantic checks for the round-7 growth/segmentation/quality
  * operators: streaks, lifecycle accounting, audience growth, RFM,
  * CUPED, template detection, token entropy, compaction planning.
  * Each test replays the operator's contract locally from the raw
  * sf0.001 tables (independent of the DuckDB oracle). */
class GrowthOpsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val userDays: Map[Long, Seq[Long]] =
    graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted.toSeq }

  test("events_streak equals a local gaps-and-islands replay") {
    val out = Events.eventsStreak(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == userDays.keySet)
    userDays.foreach { case (u, days) =>
      // split the sorted day list at gaps > 1
      val streaks = days.foldLeft(List.empty[List[Long]]) {
        case (acc, d) if acc.nonEmpty && d == acc.head.head + 1 =>
          (d :: acc.head) :: acc.tail
        case (acc, d) => List(d) :: acc
      }.map(_.size.toLong)
      assert(out(u) == ((days.size.toLong, streaks.size.toLong, streaks.max)), s"user $u")
    }
  }

  test("events_lifecycle satisfies the growth-accounting identity") {
    val rows = Events.eventsLifecycle(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(rows.nonEmpty)
    val userWeeks = userDays.view.mapValues(_.map(_ / 7).distinct.sorted).toMap
    val activeByWeek = userWeeks.toSeq.flatMap { case (u, ws) => ws.map(w => (w, u)) }
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    // active_w = new + retained + resurrected, for every week
    activeByWeek.foreach { case (w, n) =>
      val (nw, rt, rs, _) = rows(w)
      assert(nw + rt + rs == n, s"week $w identity")
    }
    // total new across weeks = distinct users; week-0 has no churn row
    assert(rows.values.map(_._1).sum == userWeeks.size)
    val minWeek = activeByWeek.keys.min
    assert(rows(minWeek)._4 == 0L, "churn cannot precede any activity")
    // churned_w = users active at w-1 minus (retained at w), censored at max week
    val maxWeek = activeByWeek.keys.max
    rows.keys.filter(w => w > minWeek && w <= maxWeek).foreach { w =>
      val churn = userWeeks.values.count(ws => ws.contains(w - 1) && !ws.contains(w))
      assert(rows(w)._4 == churn.toLong, s"week $w churn")
    }
  }

  test("events_newusers cumulative distinct matches first-seen arithmetic") {
    val rows = Events.eventsNewusers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val firstSeen = userDays.view.mapValues(_.min).toMap
    var cum = 0L
    rows.foreach { case (day, active, nNew, returning, cumOut) =>
      assert(nNew == firstSeen.values.count(_ == day).toLong, s"day $day new")
      assert(active == userDays.values.count(_.contains(day)).toLong, s"day $day active")
      assert(returning == active - nNew)
      cum += nNew
      assert(cumOut == cum, s"day $day cumulative")
    }
    assert(cum == firstSeen.size.toLong, "all users eventually counted new")
  }

  test("events_rfm scores respect quartile boundaries and the 1-3 range") {
    val rows = Experiment.eventsRfm(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val s = r.getAs[Long](c); assert(s >= 1 && s <= 3, c)
      }
      val rfm = r.getAs[Long]("rfm")
      assert(rfm == r.getAs[Long]("r_score") * 100 +
        r.getAs[Long]("f_score") * 10 + r.getAs[Long]("m_score"))
    }
    // quartile scoring: each extreme class holds ≥ ~25% of users
    // (boundary-inclusive, so at least a quarter) and not everyone
    val m3 = rows.count(_.getAs[Long]("m_score") == 3)
    val m1 = rows.count(_.getAs[Long]("m_score") == 1)
    assert(m3 >= n / 4 && m3 < n, s"m_score=3 count $m3 of $n")
    assert(m1 >= n / 4 && m1 < n, s"m_score=1 count $m1 of $n")
    // best recency must score 3 (it sits at/below the 25th percentile)
    val bestR = rows.minBy(_.getAs[Long]("recency_days"))
    assert(bestR.getAs[Long]("r_score") == 3L)
  }

  test("ab_cuped theta/rho agree with a local moment replay and reduce variance") {
    val r = Experiment.abCuped(spark, sf).collect().head
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS LONG)").as("cents"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max) / 2
    val byUser = ev.groupBy(_._1).view.mapValues { xs =>
      (xs.filter(e => e._2 == "purchase" && e._3 < mid).map(_._4).sum,
        xs.filter(e => e._2 == "purchase" && e._3 >= mid).map(_._4).sum)
    }.toMap
    val xs = byUser.values.map(_._1.toDouble).toSeq
    val ys = byUser.values.map(_._2.toDouble).toSeq
    val n = xs.size.toDouble
    val cov = n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
    val varx = n * xs.map(a => a * a).sum - xs.sum * xs.sum
    val vary = n * ys.map(a => a * a).sum - ys.sum * ys.sum
    assert(math.abs(r.getAs[Double]("theta") - cov / varx) < 1e-4)
    assert(math.abs(r.getAs[Double]("rho_sq") - cov * cov / (varx * vary)) < 1e-4)
    assert(r.getAs[Double]("rho_sq") >= 0.0 && r.getAs[Double]("rho_sq") <= 1.0)
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == byUser.size.toLong)
  }

  test("template_dup groups exactly the docs sharing a digit-masked skeleton") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.replaceAll("[0-9]+", "#").replaceAll("\\s+", " ")))
    val census = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val out = TextMetrics.templateDup(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_docs_skeleton"), r.getAs[Boolean]("is_template")))
      .toMap
    assert(out.size == docs.length, "one row per doc")
    docs.foreach { case (id, skel) =>
      val n = census(skel)
      assert(out(id)._1 == n, s"doc $id")
      assert(out(id)._2 == (n >= TextMetrics.TemplateMinDocs))
    }
  }

  test("token_entropy matches a local Shannon computation and bounds") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val out = TextMetrics.tokenEntropy(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    docs.filter(_._2.nonEmpty).foreach { case (id, toks) =>
      val (nT, nD, h, hn) = out(id)
      assert(nT == toks.length.toLong)
      val counts = toks.groupBy(identity).values.map(_.length.toLong).toSeq
      assert(nD == counts.size.toLong)
      val expH = math.log(nT.toDouble) -
        counts.map(c => c * math.log(c.toDouble)).sum / nT
      assert(math.abs(h - expH) < 1e-4, s"doc $id entropy")
      // h is rounded to 6 decimals, so allow half-ulp-of-round slack
      assert(h >= -1e-6 && h <= math.log(nT.toDouble) + 1e-6)
      if (nT > 1) assert(math.abs(hn - expH / math.log(nT.toDouble)) < 1e-4)
      // all-distinct doc has maximal normalized entropy
      if (nD == nT && nT > 1) assert(math.abs(hn - 1.0) < 1e-6)
    }
  }

  test("events_ltv cumulative value is monotone and cohort sizes are exact") {
    val rows = Events.eventsLtv(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val userWeeks = userDays.view.mapValues(_.map(_ / 7)).toMap
    val cohortOf = userWeeks.view.mapValues(_.min).toMap
    val sizes = cohortOf.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      assert(rs.head._3 == sizes(cohort), s"cohort $cohort size")
      val sorted = rs.sortBy(_._2)
      assert(sorted.head._2 == 0L, "offset 0 present (cohort week itself)")
      // LTV per user is the running mean of revenue — non-decreasing
      // because revenue cells are non-negative
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._5 >= a._5 - 1e-9, s"cohort $cohort monotone")
        case _ =>
      }
    }
  }

  test("sample_balanced keeps exactly min-class-size docs per language") {
    val out = Sampling.sampleBalanced(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val langCounts = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = langCounts.values.min
    val byLang = out.groupBy(_._2)
    assert(byLang.keySet == langCounts.keySet, "every language survives")
    byLang.foreach { case (l, xs) =>
      assert(xs.length.toLong == k, s"lang $l quota")
      // exact global per-class ranks: a permutation of 1..k
      assert(xs.map(_._3).sorted.toSeq == (1L to k).toSeq, s"lang $l ranks")
    }
    // the ranks follow the md5 draw order (spot-check the rank-1 doc)
    byLang.foreach { case (l, xs) =>
      val drawn = spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("lang") === l)
        .select(col("doc_id"),
          graft.functions.Similarity.md5Mod(concat(lit("bal-"), col("doc_id"))).as("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val first = drawn.minBy(x => (x._2, x._1))._1
      assert(xs.find(_._3 == 1L).get._1 == first, s"lang $l rank-1 doc")
    }
  }

  test("survival_curve is a proper non-increasing product-limit estimate") {
    val rows = Experiment.survivalCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val users = userDays.view.mapValues(ds => (ds.min, ds.max)).toMap
    val endDay = users.values.map(_._2).max
    val lifetimes = users.values.map { case (f, l) =>
      (l - f, l < endDay - Experiment.KmHorizonDays)
    }.toSeq
    assert(rows.map(_._2).head == users.size.toLong, "everyone at risk at min lifetime")
    var prev = 1.0
    var sProd = 1.0
    rows.foreach { case (t, nRisk, d, c, s) =>
      assert(nRisk == lifetimes.count(_._1 >= t).toLong, s"t=$t at-risk")
      assert(d == lifetimes.count(x => x._1 == t && x._2).toLong, s"t=$t churned")
      assert(c == lifetimes.count(x => x._1 == t && !x._2).toLong, s"t=$t censored")
      sProd *= 1.0 - d.toDouble / nRisk
      assert(math.abs(s - sProd) < 1e-4, s"t=$t survival")
      assert(s <= prev + 1e-9, "non-increasing")
      prev = s
    }
  }

  test("embedding_outliers reports the true farthest vectors from own-label centroids") {
    val out = graft.operators.Cluster.embeddingOutliers(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1048576).toLong).toArray))
    val byLabel = vecs.groupBy(_._2)
    val dists = byLabel.toSeq.flatMap { case (lbl, vs) =>
      val dims = vs.head._3.length
      val cent = Array.tabulate(dims) { d =>
        val s = vs.map(_._3(d)).sum; val n = vs.length
        (s - (((s % n) + n) % n)) / n
      }
      vs.map { case (id, _, q) =>
        (lbl, id) -> q.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
      }
    }.toMap
    out.groupBy(_._1).foreach { case (lbl, rs) =>
      assert(rs.length == graft.operators.Cluster.OutTopK, s"label $lbl row count")
      val expected = dists.filter(_._1._1 == lbl).toSeq
        .sortBy { case ((_, id), d) => (-d, id) }
        .take(graft.operators.Cluster.OutTopK)
        .map { case ((_, id), d) => (id, d) }.toSet
      assert(rs.map(r => (r._2, r._3)).toSet == expected, s"label $lbl top set")
      val meanD = dists.filter(_._1._1 == lbl).values.sum.toDouble /
        dists.count(_._1._1 == lbl)
      rs.foreach { case (_, _, d, ratio) =>
        assert(math.abs(ratio - d / meanD) < 1e-4)
        assert(ratio >= 1.0 - 1e-9, "an extreme vector sits above the label mean")
      }
    }
  }

  test("lang_confusion cells partition the corpus and shares sum to 1 per label") {
    val rows = TextMetrics.langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._3).sum == nDocs, "cells partition the corpus")
    rows.groupBy(_._1).foreach { case (l, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4, s"label $l shares")
    }
    rows.foreach { case (l, p, _, _, agree) => assert(agree == (l == p)) }
  }

  test("label_agreement kappa satisfies its defining identity and a literal replay") {
    val rows = TextMetrics.labelAgreement(spark, sf).collect()
    val global = rows.find(_.getString(0) == "__all__").get
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(global.getLong(1) == nDocs)
    rows.foreach { r =>
      val (po, pe) = (r.getDouble(3), r.getDouble(4))
      assert(po >= 0 && po <= 1 && pe >= 0 && pe <= 1)
      if (!r.isNullAt(5)) {
        val kappa = r.getDouble(5)
        assert(kappa <= 1.0 + 1e-9)
        // defining identity (po - pe) / (1 - pe), up to the round(,6)
        // applied independently to each of the three ratios
        assert(math.abs(kappa - (po - pe) / (1 - pe)) < 1e-4,
          s"scope ${r.getString(0)}: kappa=$kappa po=$po pe=$pe")
      }
    }
    // literal replay of the global multiclass kappa from the raw cells
    val cells = TextMetrics.langId(spark, sf)
      .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val n = cells.values.sum
    val agree = cells.collect { case ((l, p), c) if l == p => c }.sum
    val classes = cells.keys.flatMap(k => Seq(k._1, k._2)).toSet
    val e = classes.toSeq.map { c =>
      val r = cells.collect { case ((l, _), v) if l == c => v }.sum
      val cc = cells.collect { case ((_, p), v) if p == c => v }.sum
      r * cc
    }.sum
    val expected = (n.toDouble * agree - e) / (n.toDouble * n - e)
    assert(math.abs(global.getDouble(5) - expected) < 1e-6)
  }

  test("topic_terms ranks by exact integer keys within each source") {
    val rows = TextMetrics.topicTerms(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.length <= 10 && sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      // rank order == (tf desc, src_df asc, term asc)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert((a._4, -a._5, b._3) != null) // shape guard
          val ord = implicitly[Ordering[(Long, Long, String)]]
          assert(ord.lteq((-a._4, a._5, a._3), (-b._4, b._5, b._3)),
            s"$src rank ${a._2} vs ${b._2} out of order")
        case _ =>
      }
    }
  }

  test("skew_join equals the unsalted join exactly") {
    import graft.operators.Salting
    val salted = Salting.skewJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val orders = graft.sources.Tables.orders(spark, sf)
    val dim = orders.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("status_total"))
    val plain = orders.join(dim, Seq("o_orderstatus"))
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), max(col("status_total")).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(salted == plain)
  }

  test("dp_release noise is Laplace-shaped, bounded, and never exposes raw counts as exact") {
    val rows = graft.operators.Quality.dpRelease(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val truth = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet == truth.keySet)
    rows.foreach { case (src, eps, noisy) =>
      assert(eps == 1.0)
      val n = truth(src)
      // replay the md5 inverse-CDF draw locally
      val u = (graft.expressions.CrossHash.md5Mod(s"dp-$src").toDouble /
        graft.expressions.CrossHash.P.toDouble)
      val t = u - 0.5
      val noise = -1.0 * math.signum(t) * math.log(1.0 - 2.0 * math.abs(t))
      assert(math.abs(noisy - (n + noise)) < 1e-4, s"$src noise replay")
      // Laplace(1) at these u values stays within a sane band
      assert(math.abs(noisy - n) < 50.0, s"$src unbounded noise")
    }
  }

  test("cms_join_est never undershoots and audits the exact self-join size") {
    val rows = graft.operators.Sketch.cmsJoinEst(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).sorted.toSeq == (0L until graft.operators.Sketch.Depth).toSeq)
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_partkey")).count().collect()
      .map(r => { val c = r.getLong(1); c * c }).sum.toDouble
    rows.foreach { case (d, est, ex, blowup) =>
      assert(ex == exact, s"depth $d exact audit")
      assert(est >= ex, s"depth $d undershoot") // collisions only ADD mass
      assert(math.abs(blowup - est / ex) < 1e-4)
    }
  }

  test("q_unpivot round-trips the pivot matrix including zero cells") {
    val rows = graft.queries.Relational.qUnpivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val counts = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_orderstatus"), col("o_orderpriority")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val statuses = counts.keySet.map(_._1)
    assert(rows.length == statuses.size * 5, "dense status x priority grid")
    rows.foreach { case (s, p, n) =>
      assert(n == counts.getOrElse((s, p), 0L), s"cell ($s, $p)")
    }
    assert(rows.map(_._3).sum ==
      spark.read.parquet(s"$sf/orders.parquet").count(), "mass conserved")
  }

  test("dedup_incremental flags batch docs against the corpus only") {
    val rows = graft.operators.Dedup.dedupIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getBoolean(3)))
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val isBatch = docs.map { case (id, _) =>
      id -> (graft.expressions.CrossHash.md5Mod(s"inc-$id") % 10 == 0)
    }.toMap
    // output = exactly the batch docs
    assert(rows.map(_._1).toSet == docs.filter(d => isBatch(d._1)).map(_._1).toSet)
    // exact-dup flag replays as corpus text membership
    val corpusTexts = docs.filter(d => !isBatch(d._1)).map(_._2).toSet
    val textOf = docs.toMap
    rows.foreach { case (id, ex, nj, dup) =>
      assert(ex == corpusTexts.contains(textOf(id)), s"doc $id exact")
      nj.foreach(j => assert(j >= 0.5 && j <= 1.0))
      assert(dup == (ex || nj.isDefined))
    }
  }

  test("minhash_source_sim estimates track exact Jaccard within sketch error") {
    val rows = graft.operators.Sketch.minhashSourceSim(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val nSources = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source")).distinct().count().toInt
    assert(rows.length == nSources * (nSources - 1) / 2, "all pairs present")
    rows.foreach { case (a, b, m, est, exact) =>
      assert(a < b)
      assert(m >= 0 && m <= graft.operators.Sketch.MhPerms)
      assert(est >= 0.0 && est <= 1.0 && exact >= 0.0 && exact <= 1.0)
      // 64 perms → standard error ~ sqrt(j(1-j)/64) ≤ 0.0625; allow 4σ
      assert(math.abs(est - exact) < 0.3, s"($a,$b) est $est vs exact $exact")
    }
  }

  test("logreg_grad is the exact zero-weight full-batch gradient") {
    val rows = graft.operators.Learn.logregGrad(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), col("text")).collect()
    val mass = scala.collection.mutable.Map.empty[(Long, Long), Long]
    docs.foreach { r =>
      val y = if (r.getString(0) == "en") 1L else 0L
      r.getString(1).split(" ").filter(_.nonEmpty).foreach { tok =>
        val j = graft.expressions.CrossHash.md5Mod(s"lr-$tok") % graft.operators.Learn.LrBuckets
        mass((j, y)) = mass.getOrElse((j, y), 0L) + 1L
      }
    }
    rows.foreach { case (j, sPos, sNeg, grad, wNext) =>
      assert(sPos == mass.getOrElse((j, 1L), 0L), s"bucket $j pos")
      assert(sNeg == mass.getOrElse((j, 0L), 0L), s"bucket $j neg")
      assert(grad == (sNeg - sPos).toDouble / 2.0)
      assert(wNext == -grad / graft.operators.Learn.LrEtaInv)
    }
  }

  test("ols_by_group matches a local least-squares fit") {
    val rows = graft.queries.Stats.olsByGroup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(rows.nonEmpty)
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_brand"), col("p_size").cast("long"),
        expr("CAST(round(p_retailprice * 100) AS LONG)")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (brand, n, slope, intercept, rsq) =>
      val g = parts.filter(_._1 == brand)
      assert(n == g.length.toLong)
      val xs = g.map(_._2.toDouble); val ys = g.map(_._3.toDouble)
      val nn = n.toDouble
      val cov = nn * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
      val vx = nn * xs.map(a => a * a).sum - xs.sum * xs.sum
      val vy = nn * ys.map(a => a * a).sum - ys.sum * ys.sum
      if (vx > 0) {
        assert(math.abs(slope.get - cov / vx) < 1e-3, s"$brand slope")
        assert(math.abs(intercept.get - (ys.sum - cov / vx * xs.sum) / nn / 100.0) < 1e-3)
        if (vy > 0) {
          assert(math.abs(rsq.get - cov * cov / (vx * vy)) < 1e-3, s"$brand rsq")
          assert(rsq.get >= -1e-9 && rsq.get <= 1.0 + 1e-9)
        }
      } else assert(slope.isEmpty && intercept.isEmpty)
    }
  }

  test("moments_quantile estimate tracks the exact median for the near-symmetric stream") {
    val rows = graft.queries.Stats.momentsQuantile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, mean, sd, est, exact) =>
      assert(n > 0 && sd > 0, t)
      // the Cornish-Fisher median correction is a sub-σ adjustment —
      // the estimate must land within one sd of both mean and truth
      assert(math.abs(est - mean) <= sd + 1e-9, s"$t est vs mean")
      assert(math.abs(est - exact) <= sd + 1e-9, s"$t est vs exact")
    }
  }

  test("doc_cosine_pairs keep test is exactly cosine >= 1/2 on tf vectors") {
    val rows = graft.operators.Dedup.docCosinePairs(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))))
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (dot, na, nb, cos)) =>
      assert(a < b)
      assert(4 * dot * dot >= na * nb, "integer keep test")
      assert(cos >= 0.5 - 1e-6 && cos <= 1.0 + 1e-9)
      assert(math.abs(cos - dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))) < 1e-5)
    }
    // spot-check one pair against a local tf-vector replay
    val ((a, b), (dot, na, nb, _)) = rows.head
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") === a || col("doc_id") === b)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
    val df = spark.read.parquet(s"$sf/documents.parquet").collect()
      .flatMap(r => r.getAs[String]("text").split(" ").filter(_.nonEmpty).distinct
        .map(t => t -> 1)).groupBy(_._1).view.mapValues(_.length).toMap
    def vec(id: Long) = docs(id).split(" ").filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong)
      .filter { case (t, _) => df(t) <= graft.operators.Dedup.CosDfCap }.toMap
    val (va, vb) = (vec(a), vec(b))
    assert(dot == va.keySet.intersect(vb.keySet).toSeq.map(t => va(t) * vb(t)).sum)
    assert(na == va.values.map(v => v * v).sum)
    assert(nb == vb.values.map(v => v * v).sum)
  }

  test("events_paths counts the true trigram sequences and reports exact shares") {
    val rows = Events.eventsPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == Events.PathTopN || rows.nonEmpty)
    // replay trigram paths locally from the ordered event log
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
    val census = ev.groupBy(_._1).values.flatMap { g =>
      val types = g.sortBy(x => (x._2, x._3)).map(_._4)
      types.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = census.values.sum
    rows.foreach { case (p, n, share) =>
      assert(census(p) == n, s"path $p")
      assert(math.abs(share - n.toDouble / total) < 1e-5)
    }
    // top-N really is the N largest counts
    val cut = rows.map(_._2).min
    assert(census.values.count(_ > cut) < rows.length)
  }

  test("profile_drift halves partition the table and deltas are consistent") {
    val rows = graft.operators.Profile.profileDrift(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(rows.keySet == Set("n_orders", "mean_price", "n_customers", "max_price"))
    val nTotal = spark.read.parquet(s"$sf/orders.parquet").count()
    val (b, a, _) = rows("n_orders")
    assert(b + a == nTotal.toDouble, "halves partition the table")
    rows.values.foreach { case (bv, av, d) =>
      d.foreach(x => assert(math.abs(x - (av - bv) / bv) < 1e-5))
    }
  }

  test("lang_id_trigram profiles beat 'und' and agree with a local replay on a sample") {
    val out = TextMetrics.langIdTrigram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getBoolean(4)))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.length == nDocs.toInt, "one row per doc")
    out.foreach { case (_, l, p, v, agree) =>
      assert(agree == (l == p))
      if (p == "und") assert(v == 0L)
    }
    // trigram profiles are built FROM the labels, so most docs must hit
    // a profile (ASCII corpora share trigrams heavily — just require
    // the detector produced real predictions, not a degenerate 'und')
    assert(out.count(_._3 != "und") > out.length / 2)
  }

  test("auc_eval matches a local tie-aware rank computation") {
    val r = graft.operators.Learn.aucEval(spark, sf).collect().head
    val scored = TextMetrics.qualityClassifier(spark, sf)
      .select(col("doc_id"), col("score")).collect()
      .filter(x => !x.isNullAt(1)).map(x => (x.getLong(0), x.getDouble(1))).toMap
    val langs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang")).collect()
      .map(x => x.getLong(0) -> (x.getString(1) == "en")).toMap
    val pos = scored.filter { case (id, _) => langs(id) }.values.toSeq
    val neg = scored.filter { case (id, _) => !langs(id) }.values.toSeq
    assert(r.getAs[Long]("n_pos") == pos.size && r.getAs[Long]("n_neg") == neg.size)
    var num = 0.0
    pos.foreach(p => neg.foreach { n =>
      if (p > n) num += 1.0 else if (p == n) num += 0.5
    })
    val expected = num / (pos.size.toDouble * neg.size.toDouble)
    assert(math.abs(r.getAs[Double]("auc") - expected) < 1e-5)
    assert(r.getAs[Double]("auc") >= 0.0 && r.getAs[Double]("auc") <= 1.0)
  }

  test("calibration_curve bins partition the scored docs and rates are exact") {
    val rows = graft.operators.Learn.calibrationCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(rows.nonEmpty)
    val scored = TextMetrics.qualityClassifier(spark, sf)
      .filter(col("score").isNotNull).count()
    assert(rows.map(_._2).sum == scored, "bins partition the scored docs")
    rows.foreach { case (bin, n, np, rate) =>
      assert(bin >= 0 && bin < graft.operators.Learn.CalBins)
      assert(np <= n)
      assert(math.abs(rate - np.toDouble / n) < 1e-6)
    }
  }

  test("pr_curve confusion counts replay exactly at every threshold") {
    val docs = TextMetrics.qualityClassifier(spark, sf)
      .filter(col("score").isNotNull)
      .select(col("doc_id"), col("margin_raw"), col("n_tokens")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val en = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang")).collect()
      .map(x => x.getLong(0) -> (x.getString(1) == "en")).toMap
    val rows = graft.operators.Learn.prCurve(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == graft.operators.Learn.PrThresholdsMilli.toSet)
    graft.operators.Learn.PrThresholdsMilli.foreach { t =>
      val (tp, fp, fn, tn) = docs.foldLeft((0L, 0L, 0L, 0L)) {
        case ((a, b, c, d), (id, m, n)) =>
          val pred = m > t * n
          val y = en(id)
          (a + (if (pred && y) 1 else 0), b + (if (pred && !y) 1 else 0),
            c + (if (!pred && y) 1 else 0), d + (if (!pred && !y) 1 else 0))
      }
      val r = rows(t)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((tp, fp, fn, tn)), s"t=$t")
      if (tp + fp > 0)
        assert(math.abs(r.getDouble(5) - tp.toDouble / (tp + fp)) < 1e-6, s"precision t=$t")
      if (tp + fn > 0)
        assert(math.abs(r.getDouble(6) - tp.toDouble / (tp + fn)) < 1e-6, s"recall t=$t")
    }
    // the sweep must actually sweep: recall strictly drops across the grid
    val recalls = graft.operators.Learn.PrThresholdsMilli.sorted.map(t => rows(t).getLong(1))
    assert(recalls.head > recalls.last, "degenerate threshold grid")
  }

  test("woe_binning replays locally and IV ranks signal above the noise control") {
    val q = TextMetrics.qualityScore(spark, sf)
      .select(col("doc_id"), col("quality_score"), col("stopword_ratio")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val chars = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut = graft.operators.Learn.WoeQualityCut
    val labeled = q.map { case (id, qs, sr) => (id, if (qs < cut) 1L else 0L, sr) }
    val p = labeled.count(_._2 == 1L).toLong
    val nTot = labeled.length - p
    def cells(f: ((Long, Long, Double)) => Long): Map[Long, (Long, Long)] =
      labeled.groupBy(f).view.mapValues(g =>
        (g.count(_._2 == 1L).toLong, g.count(_._2 == 0L).toLong)).toMap
    val byFeature = Map(
      "chars" -> cells { case (id, _, _) => math.min(chars(id) / 100, 5L) },
      "stopword" -> cells { case (_, _, sr) => math.min(math.floor(sr * 20).toLong, 4L) },
      "hash_noise" -> cells { case (id, _, _) =>
        graft.expressions.CrossHash.md5Mod(s"woe-$id") % 4 })
    val rows = graft.operators.Learn.woeBinning(spark, sf).collect()
    val iv = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    rows.foreach { r =>
      val (f, b) = (r.getString(0), r.getLong(1))
      val (np, nn) = byFeature(f)(b)
      assert((r.getLong(3), r.getLong(4)) == ((np, nn)), s"$f/$b counts")
      if (np == 0 || nn == 0) assert(r.isNullAt(5) && r.isNullAt(6), s"$f/$b null guard")
      else {
        val woe = math.log((np.toDouble / p) / (nn.toDouble / nTot))
        assert(math.abs(r.getDouble(5) - woe) < 1e-6, s"$f/$b woe")
        iv(f) += r.getDouble(6)
      }
    }
    // the constructed-signal features must out-rank the md5 null
    // control: chars carries the dominant 0.4 quality weight (≫),
    // stopword the 0.3 weight over a narrow range (>)
    assert(iv("chars") > 10 * iv("hash_noise"), s"iv ranking: $iv")
    assert(iv("stopword") > iv("hash_noise"), s"iv ranking: $iv")
  }

  test("gini_concentration matches a local Lorenz computation") {
    val r = graft.queries.Stats.giniConcentration(spark, sf).collect().head
    val spend = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(expr("CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS LONG)").as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val sorted = spend.sortBy(x => (x._2, x._1)).map(_._2)
    val n = sorted.length
    val sx = sorted.map(BigInt(_)).sum
    val six = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = (BigInt(2) * six - BigInt(n + 1) * sx).toDouble / (BigInt(n) * sx).toDouble
    assert(r.getAs[Long]("n_customers") == n.toLong)
    assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-5)
    val topK = n / 10
    val topShare = sorted.takeRight(topK).map(BigInt(_)).sum.toDouble / sx.toDouble
    assert(math.abs(r.getAs[Double]("top10_share") - topShare) < 1e-5)
    // concentration sanity: top decile holds more than a tenth of spend
    assert(r.getAs[Double]("top10_share") > 0.1)
    assert(r.getAs[Double]("gini") >= 0.0 && r.getAs[Double]("gini") < 1.0)
  }

  test("events_autocorr matches a local dense-series replay") {
    val rows = graft.queries.Events.eventsAutocorr(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS LONG)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (t, nHours, r1, r24) =>
      val g = ev.filter(_._1 == t)
      val byH = g.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val h0 = byH.keys.min; val h1 = byH.keys.max
      val a = (h0 to h1).map(h => byH.getOrElse(h, 0L).toDouble / 100.0)
      assert(nHours == a.length.toLong, s"$t length")
      val mu = a.sum / a.length
      def rk(k: Int): Option[Double] = {
        val den = a.map(x => (x - mu) * (x - mu)).sum
        if (a.length > k && den > 0)
          Some(a.dropRight(k).zip(a.drop(k)).map { case (x, y) => (x - mu) * (y - mu) }.sum / den)
        else None
      }
      (r1, rk(1)) match {
        case (Some(o), Some(e)) => assert(math.abs(o - e) < 1e-4, s"$t r1")
        case (a_, b_) => assert(a_.isDefined == b_.isDefined)
      }
      (r24, rk(24)) match {
        case (Some(o), Some(e)) => assert(math.abs(o - e) < 1e-4, s"$t r24")
        case (a_, b_) => assert(a_.isDefined == b_.isDefined)
      }
      // autocorrelation is a correlation: bounded
      r1.foreach(v => assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
      r24.foreach(v => assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
    }
  }

  test("conversion_ci brackets the rate and matches a local Wilson computation") {
    val rows = graft.operators.Experiment.conversionCi(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, k, rate, lo, hi) =>
      assert(k <= n)
      assert(math.abs(rate - k.toDouble / n) < 1e-6)
      assert(lo <= rate + 1e-9 && rate <= hi + 1e-9, "interval brackets the estimate")
      assert(lo >= -1e-6 && hi <= 1.0 + 1e-6, "Wilson never leaves [0,1]")
      val z = 1.96; val p = k.toDouble / n; val z2n = z * z / n
      val center = (p + z2n / 2.0) / (1.0 + z2n)
      val half = z * math.sqrt(p * (1.0 - p) / n + z2n / (4.0 * n)) / (1.0 + z2n)
      assert(math.abs(lo - (center - half)) < 1e-5)
      assert(math.abs(hi - (center + half)) < 1e-5)
    }
  }

  test("source_kl is nonnegative and matches a local smoothed replay") {
    val rows = TextMetrics.sourceKl(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val corpusCounts = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val vocab = corpusCounts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(TextMetrics.KlVocab).map(_._1)
    val nCorpus = corpusCounts.values.sum
    val v = TextMetrics.KlVocab
    rows.foreach { case (src, nTok, kl) =>
      val toks = docs.filter(_._1 == src).flatMap(_._2)
      assert(nTok == toks.length.toLong, s"$src token count")
      val cs = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val expected = vocab.map { t =>
        val p = (cs.getOrElse(t, 0L) + 1).toDouble / (toks.length + v)
        val q = (corpusCounts(t) + 1).toDouble / (nCorpus + v)
        p * math.log(p / q)
      }.sum
      assert(math.abs(kl - expected) < 1e-4, s"$src kl")
      // KL over a sub-vocabulary is not strictly >= 0 mathematically,
      // but with smoothing and dominated mass it must be small-bounded
      assert(kl > -0.5 && kl < 5.0, s"$src kl range")
    }
  }

  test("compact_plan bins respect the next-fit-decreasing invariants") {
    val rows = Layout.compactPlan(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // conservation: every file lands in exactly one bin
    docs.groupBy(_._1).foreach { case (src, fs) =>
      val bins = rows.filter(_._1._1 == src)
      assert(bins.map(_._2._1).sum == fs.length.toLong, s"$src file count")
      assert(bins.map(_._2._2).sum == fs.map(_._2).sum, s"$src char total")
    }
    rows.groupBy(_._1._1).foreach { case (src, bins) =>
      val sorted = bins.sortBy(_._1._2)
      // bins are dense from 0 and sizes within a bin are descending
      assert(sorted.head._1._2 == 0L, s"$src starts at bin 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._1._2 == a._1._2 + 1, s"$src bins dense")
          // size-descending packing: a later bin's largest file cannot
          // exceed an earlier bin's smallest
          assert(b._2._3 <= a._2._4, s"$src monotone sizes")
        case _ =>
      }
      // every bin except possibly the last crosses the target once the
      // next file is added — i.e. cum at bin start < target boundary
      // (structural: bin index comes from the prefix sum, so just check
      // no bin is wildly overfull: at most target + largest file)
      sorted.dropRight(1).foreach { case ((_, _), (_, chars, largest, _)) =>
        assert(chars <= Layout.CompactTarget + largest, s"$src overfull bin")
      }
    }
  }

  test("events_cusum equals a literal CUSUM recursion replay") {
    val daily = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").count().collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val days = daily.keys.map(_._2)
    val (d0, d1) = (days.min, days.max)
    val types = daily.keys.map(_._1).toSeq.distinct
    val got = Events.eventsCusum(spark, sf).collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate.toEpochDay),
        (r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got.size == types.size * (d1 - d0 + 1).toInt)
    types.foreach { t =>
      val xs = (d0 to d1).map(d => daily.getOrElse((t, d), 0L))
      val dCount = xs.length.toLong
      val total = xs.sum
      // literal recursion on D-scaled integers: C_t = max(0, C_{t-1} + D·x_t − T)
      var c = 0L
      (d0 to d1).zip(xs).foreach { case (d, x) =>
        c = math.max(0L, c + dCount * x - total)
        val (n, excess, alarm) = got((t, d))
        assert(n == x, s"$t day $d count")
        val expected = BigDecimal(c.toDouble / dCount.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(excess - expected) < 1e-9, s"$t day $d excess")
        assert(alarm == (c > total), s"$t day $d alarm")
      }
    }
  }

  test("ngram_novelty: first doc is fully novel and novel counts sum to distinct grams") {
    val out = TextMetrics.ngramNovelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).sortBy(_._1)
    assert(out.nonEmpty)
    // the earliest doc carrying grams must be 100% novel
    val firstWith = out.find(_._2 > 0).get
    assert(firstWith._4.contains(1.0), s"first gram-bearing doc ${firstWith._1}")
    // every novelty in [0,1]; short docs carry null
    out.foreach { case (id, ng, nv, nov) =>
      assert(nv <= ng, s"doc $id novel<=grams")
      if (ng == 0) assert(nov.isEmpty, s"doc $id short-doc null")
      else assert(nov.exists(x => x >= 0.0 && x <= 1.0), s"doc $id range")
    }
    // conservation: each distinct corpus gram is novel in exactly one doc
    val distinctGrams = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, greatest(size(split(text, ' ')) - 4, 0)),
          | i -> concat_ws(' ', slice(split(text, ' '), i, 5)))""".stripMargin))
        .as("g"))
      .filter(size(split(col("g"), " ")) === 5)
      .select(graft.functions.Similarity.md5Mod(col("g")).as("h"))
      .distinct().count()
    assert(out.map(_._3).sum == distinctGrams, "sum of novel = distinct grams")
  }

  test("hill_tail equals a local order-statistics replay") {
    val lens = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = graft.queries.Stats.hillTail(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    lens.foreach { case (src, xs) =>
      val top = xs.toSeq.map(t => (t._2, t._3)).sortBy(t => (-t._1, t._2)).take(65)
      if (top.size >= 2) {
        val asc = top.sortBy(identity)
        val xk = asc.head._1
        val gammaRaw = asc.drop(1).map(t => math.log(t._1.toDouble / xk.toDouble)).sum /
          (top.size - 1).toDouble
        val gamma = BigDecimal(gammaRaw)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (kUsed, xThr, g, alpha) = got(src)
        assert(kUsed == top.size - 1 && xThr == xk, s"$src shape")
        assert(math.abs(g - gamma) < 1e-9, s"$src gamma")
        if (gamma > 0)
          assert(alpha.exists(a => math.abs(a - BigDecimal(1.0 / gamma)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9), s"$src alpha")
        else assert(alpha.isEmpty, s"$src alpha null")
      } else assert(!got.contains(src), s"$src too small")
    }
  }

  test("ks_test equals a local exact ECDF replay") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nTot = docs.length.toLong
    val values = docs.map(_._2).distinct.sorted
    val got = graft.queries.Stats.ksTest(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val nA = xs.length.toLong
      val nB = nTot - nA
      val ownCounts = xs.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
      val totCounts = docs.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
      var cumA = 0L; var cumT = 0L; var m = 0L
      values.foreach { v =>
        cumA += ownCounts.getOrElse(v, 0L); cumT += totCounts(v)
        m = math.max(m, math.abs(cumA * nB - (cumT - cumA) * nA))
      }
      val (gNA, gNB, d, sig) = got(src)
      assert(gNA == nA && gNB == nB, s"$src counts")
      val dExp = BigDecimal(m.toDouble / (nA * nB).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(d - dExp) < 1e-9, s"$src d_stat")
      assert(sig == (BigInt(m) * m * 10000 > BigInt(18496) * nTot * nA * nB),
        s"$src significance")
    }
  }

  test("benford_check: spine complete, shares consistent, TPC-H fails the screen") {
    val rows = graft.queries.Stats.benfordCheck(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 9L))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "observed shares sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "Benford shares sum to 1")
    rows.foreach { case (d, n, obs, exp, dev) =>
      assert(math.abs(dev - math.abs(obs - exp)) < 2e-6, s"digit $d dev")
    }
    // uniform-magnitude synthetic prices must NOT look Benford —
    // the screen exists to catch exactly this shape
    assert(rows.map(_._5).max > 0.05, "synthetic prices must fail the screen")
  }

  test("bootstrap_ci brackets the point mean and replays a local Poisson bootstrap") {
    val rows = Experiment.bootstrapCi(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_.getLong(1)).sum == ev.length)
    rows.foreach { r =>
      assert(r.getLong(2) == Experiment.BootB.toLong)
      val (m, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo < hi, s"${r.getString(0)}: degenerate CI")
      assert(lo <= m && m <= hi,
        s"${r.getString(0)}: mean $m outside percentile CI [$lo, $hi]")
    }
    // literal local replay of one type's resample means
    val typ = rows.head.getString(0)
    val sub = ev.filter(_._1 == typ)
    def md5mod(s: String): Long = graft.expressions.CrossHash.md5Mod(s)
    val means = (0 until Experiment.BootB).flatMap { b =>
      var sum = 0L; var n = 0L
      sub.foreach { case (_, id, cents) =>
        val u = md5mod(s"boot-$id-$b").toDouble / graft.expressions.CrossHash.P.toDouble
        val k = Experiment.PoisCum.indexWhere(u < _) match {
          case -1 => 9L
          case i  => i.toLong
        }
        sum += k * cents; n += k
      }
      if (n > 0) Some((sum.toDouble / (100.0 * n.toDouble), b)) else None
    }.sorted
    val bp = means.length
    val expLo = means(((bp * 25 + 999) / 1000 - 1).toInt)._1
    val expHi = means(((bp * 975 + 999) / 1000 - 1).toInt)._1
    val got = rows.find(_.getString(0) == typ).get
    assert(got.getDouble(4) == expLo, s"ci_lo replay mismatch for $typ")
    assert(got.getDouble(5) == expHi, s"ci_hi replay mismatch for $typ")
  }

  test("grader_significance: paired delta matches the graders' own point accuracies") {
    val r = TextMetrics.graderSignificance(spark, sf).head()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(r.getLong(0) == nDocs)
    assert(r.getLong(1) == Experiment.BootB.toLong)
    val (accA, accB, delta) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(math.abs(delta - (accA - accB)) < 2e-6, "delta is the paired difference")
    val (lo, hi) = (r.getDouble(5), r.getDouble(6))
    assert(lo <= hi)
    assert(lo <= delta + 1e-6 && delta <= hi + 1e-6,
      "point delta must sit inside its own bootstrap CI")
    assert(r.getBoolean(7) == (lo > 0.0 || hi < 0.0))
    // replay the point accuracies from the graders directly
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), (col("lang") === "en").as("y"))
    val qa = TextMetrics.qualityScore(spark, sf)
      .select(col("doc_id"), (col("quality_score") >= 0.5).as("p"))
      .join(docs, Seq("doc_id"))
      .filter(col("p") === col("y")).count()
    val qb = TextMetrics.qualityClassifier(spark, sf)
      .select(col("doc_id"), (col("margin_raw") > 0L).as("p"))
      .join(docs, Seq("doc_id"))
      .filter(col("p") === col("y")).count()
    assert(math.abs(accA - qa.toDouble / nDocs) < 1e-6)
    assert(math.abs(accB - qb.toDouble / nDocs) < 1e-6)
  }

  test("search_eval replays a literal local MRR/MAP over the bm25 ranking") {
    import graft.operators.Search
    val out = Search.searchEval(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Search.bm25Queries.map(_._1).toSet)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val ranked = Search.bm25Rank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    Search.bm25Queries.foreach { case (qid, terms) =>
      val rel = docs.collect { case (id, toks)
        if terms.forall(t => toks.count(_ == t) >= Search.EvalMinTf) => id }.toSet
      val top = ranked.filter(_._1 == qid)
        .sortBy { case (_, id, s) => (-s, id) }.map(_._2)
      val hits = top.count(rel)
      val r = out(qid)
      assert(r.getLong(1) == rel.size, s"$qid n_relevant")
      assert(r.getLong(3) == hits, s"$qid n_hits")
      val firstIdx = top.indexWhere(rel)
      val mrr = if (firstIdx < 0) 0.0 else 1.0 / (firstIdx + 1)
      assert(math.abs(r.getDouble(5) - mrr) < 1e-6, s"$qid mrr")
      var cum = 0
      val apNum = top.zipWithIndex.map { case (id, i) =>
        if (rel(id)) { cum += 1; cum.toDouble / (i + 1) } else 0.0
      }.sorted.sum
      val ap = if (rel.isEmpty) 0.0 else apNum / math.min(rel.size, Search.TopN)
      assert(math.abs(r.getDouble(6) - ap) < 1e-6, s"$qid ap")
    }
  }

  test("negative_mining excludes every relevant doc and picks top-K of the rest") {
    import graft.operators.Search
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val scored = Search.scoredCorpus(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = Search.negativeMining(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    Search.bm25Queries.foreach { case (qid, terms) =>
      val rel = docs.collect { case (id, toks)
        if terms.forall(t => toks.count(_ == t) >= Search.EvalMinTf) => id }.toSet
      val expect = scored.filter(s => s._1 == qid && !rel(s._2))
        .sortBy { case (_, id, sc) => (-sc, id) }.take(Search.HardK)
      val mine = got.filter(_._1 == qid).sortBy(_._2)
      assert(mine.map(x => (x._3, x._4)).toSeq == expect.map(x => (x._2, x._3)).toSeq, qid)
      assert(mine.map(_._2).toSeq == (1L to mine.length.toLong).toSeq, s"$qid ranks contiguous")
      mine.foreach(x => assert(!rel(x._3), s"$qid leaked a relevant doc"))
    }
    // the anti-join must matter: some negative sits below the plain top-k
    val topk = Search.bm25Rank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.exists(x => !topk((x._1, x._3))), "negatives identical to top-k")
  }

  test("events_twa replays duration-weighted segment averages") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")),
        (col("value").cast("decimal(18,2)") * 100).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(e => (e._1, e._3 / 86400000000L)).flatMap { case (k, es) =>
      val s = es.sortBy(e => (e._3, e._2))
      val segs = s.zip(s.tail).map { case (a, b) => (a._4, b._3 - a._3) }
      if (segs.isEmpty) None
      else {
        val span = segs.map(_._2).sum
        val wsum = segs.map(t => BigInt(t._1) * t._2).sum
        Some(k -> (segs.size.toLong, span,
          if (span > 0) Some(wsum.toDouble / span / 100.0) else None))
      }
    }
    val got = Events.eventsTwa(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, (n, span, twa)) =>
      val r = got(k)
      assert(r.getLong(2) == n && r.getLong(3) == span, s"$k segments/span")
      twa.foreach(t => assert(math.abs(r.getDouble(4) - t) < 1e-5, s"$k twa"))
    }
  }

  test("blocking_eval counts replay and the strategy table is instructive") {
    import graft.operators.EntityMatch
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey").cast("long"), lower(col("c_name")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .select(col("s_suppkey"), col("s_nationkey").cast("long"), lower(col("s_name")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val gold = EntityMatch.entityMatch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val goldNation = cust.map(c => c._1 -> c._2).toMap
    val suppNation = supp.map(s => s._1 -> s._2).toMap
    val rows = EntityMatch.blockingEval(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("nation_block", "mod10_block", "sorted_neighborhood"))
    // nation block: candidate volume = sum of per-nation count products,
    // recall 1.0 by construction
    val natCand = cust.groupBy(_._2).map { case (n, cs) =>
      cs.size.toLong * supp.count(_._2 == n) }.sum
    assert(rows("nation_block").getLong(1) == natCand)
    assert(rows("nation_block").getDouble(4) == 1.0)
    // mod10: replay both counts
    val modCand = cust.groupBy(_._1 % 10).map { case (k, cs) =>
      cs.size.toLong * supp.count(_._1 % 10 == k) }.sum
    val modHits = gold.count { case (c, s) => c % 10 == s % 10 }
    assert(rows("mod10_block").getLong(1) == modCand)
    assert(rows("mod10_block").getLong(3) == modHits.toLong)
    // sorted neighborhood: replay the rank-window cross-type candidates
    val ranked = (cust.map(c => (c._1, c._3)) ++ supp.map(s => (s._1 + 1000000000L, s._3)))
      .sortBy(r => (r._2, r._1)).map(_._1)
    val snCand = ranked.zipWithIndex.flatMap { case (a, i) =>
      (i + 1 to math.min(i + EntityMatch.SnWindow, ranked.length - 1)).map(j => (a, ranked(j)))
    }.filter { case (a, b) => (a < 1000000000L) != (b < 1000000000L) }
    assert(rows("sorted_neighborhood").getLong(1) == snCand.length.toLong)
    // every n_gold agrees; recall/reduction are consistent ratios
    rows.values.foreach { r =>
      assert(r.getLong(2) == gold.size.toLong)
      assert(math.abs(r.getDouble(4) - r.getLong(3).toDouble / r.getLong(2)) < 1e-6)
    }
  }

  test("seasonality_strength replays the variance decomposition") {
    val hours = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600000000L * 3600000000L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = Events.seasonalityStrength(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val byType = hours.toSeq.groupBy(_._1._1)
    assert(rows.keySet == byType.keySet)
    byType.foreach { case (t, hs) =>
      val cs = hs.map(_._2).map(_.toDouble)
      val n = cs.length
      val mean = cs.sum / n
      val varTotal = cs.map(c => (c - mean) * (c - mean)).sum / n
      val cellMeans = hs.groupBy(_._1._2 % 86400000000L / 3600000000L)
        .view.mapValues(g => g.map(_._2.toDouble).sum / g.size).toMap
      val varResid = hs.map { case ((_, hr), c) =>
        val m = cellMeans(hr % 86400000000L / 3600000000L)
        (c - m) * (c - m)
      }.sum / n
      val r = rows(t)
      assert(r.getLong(1) == n.toLong, s"$t hours")
      assert(math.abs(r.getDouble(2) - varTotal) < 1e-3, s"$t var_total")
      assert(math.abs(r.getDouble(3) - varResid) < 1e-3, s"$t var_resid")
      val exp = math.max(0.0, 1.0 - varResid / varTotal)
      assert(math.abs(r.getDouble(4) - exp) < 1e-4, s"$t strength")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("ab_ratio_delta replays the delta-method variance from per-user sums") {
    val users = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (u, es) =>
        val x = es.collect { case (_, "purchase", c) => c }.sum
        (graft.expressions.CrossHash.md5Mod(s"ab-$u") % 2, x.toDouble, es.size.toDouble)
      }.toSeq
    def side(v: Long): (Long, Double, Double) = {
      val g = users.filter(_._1 == v)
      val n = g.size.toDouble
      val (sx, sy) = (g.map(_._2).sum, g.map(_._3).sum)
      val r = sx / sy
      val mx = sx / n; val my = sy / n
      val vx = g.map(t => (t._2 - mx) * (t._2 - mx)).sum / (n - 1)
      val vy = g.map(t => (t._3 - my) * (t._3 - my)).sum / (n - 1)
      val vxy = g.map(t => (t._2 - mx) * (t._3 - my)).sum / (n - 1)
      val varR = (vx - 2 * r * vxy + r * r * vy) / (n * my * my)
      (g.size.toLong, r, varR)
    }
    val (na, ra, va) = side(0)
    val (nb, rb, vb) = side(1)
    val row = Experiment.abRatioDelta(spark, sf).collect().head
    assert(row.getLong(0) == na && row.getLong(1) == nb)
    assert(math.abs(row.getDouble(2) - ra / 100.0) < 1e-6)
    assert(math.abs(row.getDouble(3) - rb / 100.0) < 1e-6)
    val z = (rb - ra) / math.sqrt(va + vb)
    assert(math.abs(row.getDouble(6) - z) < 1e-4, "delta-method z")
    // null md5 split: the honest answer is no significance
    assert(!row.getBoolean(7), "null split flagged significant")
  }

  test("session_gap_tune equals a literal re-sessionization at every gap") {
    val byUser = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3)).map(_._2)).toMap
    val nEvents = byUser.values.map(_.size).sum
    val rows = Events.sessionGapTune(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet == Events.SessionGapGrid.toSet)
    Events.SessionGapGrid.foreach { g =>
      // literal sessionization: a new session starts at every gap breach
      val sessions = byUser.values.map { ts =>
        1 + ts.zip(ts.tail).count { case (a, b) => b - a > g * 60000000L }
      }.sum
      assert(rows(g)._1 == sessions.toLong, s"gap $g sessions")
      assert(math.abs(rows(g)._2 - nEvents.toDouble / sessions) < 1e-6, s"gap $g mean")
    }
    // the sweep must discriminate across the grid
    val counts = Events.SessionGapGrid.map(rows(_)._1)
    assert(counts.head > 2 * counts.last, "grid fails to move session counts")
  }

  test("sample_quantile_eval: exact side replays a local interpolation, errors bounded") {
    val cents = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sorted = cents.map(_._2).sorted
    def q(v: Array[Long], p: Double): Double = {
      val h = p * (v.length - 1)
      val lo = h.toInt
      if (lo + 1 >= v.length) v(lo).toDouble
      else v(lo) + (h - lo) * (v(lo + 1) - v(lo))
    }
    val rows = graft.queries.Stats.sampleQuantileEval(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == graft.queries.Stats.SqProbes.map(_._1).toSet)
    val p16 = graft.expressions.CrossHash.P / 16
    val sample = cents.filter { case (k, _) =>
      graft.expressions.CrossHash.md5Mod(s"sq-$k") < p16 }.map(_._2).sorted
    graft.queries.Stats.SqProbes.foreach { case (lbl, p) =>
      val r = rows(lbl)
      assert(r.getLong(1) == cents.length && r.getLong(2) == sample.length)
      assert(math.abs(r.getDouble(3) - q(sorted, p) / 100.0) < 1e-4, s"$lbl exact")
      assert(math.abs(r.getDouble(4) - q(sample, p) / 100.0) < 1e-4, s"$lbl sample")
      // ~94 sampled rows at sf0.001 → sampling error up to ~20% is
      // plausible; the bound only guards against a broken sample
      assert(r.getDouble(6) < 0.3, s"$lbl rel error implausibly large")
    }
    // the sample is a real sample, not the table
    assert(sample.length < cents.length / 8)
  }

  test("filter_sweep token shares replay and decay monotonically") {
    val q = TextMetrics.qualityScore(spark, sf)
      .select(col("n_words"), col("quality_score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val tokTotal = q.map(_._1).sum
    val rows = Sampling.filterSweep(spark, sf).collect()
      .sortBy(_.getDouble(0))
    assert(rows.map(_.getDouble(0)).toSeq == Sampling.FilterGrid)
    rows.foreach { r =>
      val t = r.getDouble(0)
      val kept = q.filter(_._2 >= t)
      assert(r.getLong(1) == kept.length.toLong, s"t=$t docs")
      assert(r.getLong(2) == kept.map(_._1).sum, s"t=$t tokens")
      assert(math.abs(r.getDouble(4) - kept.map(_._1).sum.toDouble / tokTotal) < 1e-6)
    }
    val docShares = rows.map(_.getDouble(3))
    assert(docShares.zip(docShares.tail).forall { case (a, b) => b <= a + 1e-9 })
    // quality favors long docs: token share must sit above doc share
    rows.foreach(r => assert(r.getDouble(4) >= r.getDouble(3) - 1e-9))
  }

  test("events_residual_anomaly replays hour-of-day cell z-scores") {
    val hours = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600000000L * 3600000000L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = hours.toSeq
      .groupBy { case ((t, hr), _) => (t, hr % 86400000000L / 3600000000L) }
      .view.mapValues { g =>
        val cs = g.map(_._2)
        (cs.size.toLong, cs.sum, cs.map(c => c * c).sum)
      }.toMap
    val expected = hours.toSeq.flatMap { case ((t, hr), cnt) =>
      val hod = hr % 86400000000L / 3600000000L
      val (nh, sc, scc) = cells((t, hod))
      val varNum = nh * scc - sc * sc
      if (varNum <= 0) None
      else {
        val mean = sc.toDouble / nh
        val z = BigDecimal((cnt.toDouble - mean) /
          (math.sqrt(varNum.toDouble) / nh))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (math.abs(z) > 2) Some((t, hr) -> (cnt, z)) else None
      }
    }.toMap
    val got = Events.eventsResidualAnomaly(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getDouble(5))).toMap
    assert(got.keySet == expected.keySet)
    assert(got.nonEmpty, "degenerate: no seasonal-cell anomalies")
    got.foreach { case (k, (cnt, z)) =>
      assert(cnt == expected(k)._1)
      assert(math.abs(z - expected(k)._2) < 1e-6, s"$k z")
    }
  }

  test("search_ndcg replays graded DCG/IDCG over the bm25 ranking") {
    import graft.operators.Search
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val ranked = Search.bm25Rank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val out = Search.searchNdcg(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Search.bm25Queries.map(_._1).toSet)
    Search.bm25Queries.foreach { case (qid, terms) =>
      def grade(toks: Seq[String]): Long = {
        val m = terms.map(t => toks.count(_ == t)).min
        if (m >= 5) 3L else if (m == 4) 2L else if (m == 3) 1L else 0L
      }
      val top = ranked.filter(_._1 == qid)
        .sortBy { case (_, id, s) => (-s, id) }.map(_._2)
      val dcg = top.zipWithIndex
        .map { case (id, i) => grade(docs(id)).toDouble / math.log(i + 2.0) }
        .sorted.sum
      val gradesDesc = docs.toSeq.map { case (id, t) => (grade(t), id) }
        .filter(_._1 > 0).sortBy { case (g, id) => (-g, id) }
        .take(Search.TopN).map(_._1)
      val idcg = gradesDesc.zipWithIndex
        .map { case (g, i) => g.toDouble / math.log(i + 2.0) }.sorted.sum
      val r = out(qid)
      assert(math.abs(r.getDouble(3) - dcg) < 1e-6, s"$qid dcg")
      assert(math.abs(r.getDouble(4) - idcg) < 1e-6, s"$qid idcg")
      if (idcg > 0) {
        assert(math.abs(r.getDouble(5) - dcg / idcg) < 1e-6, s"$qid ndcg")
        assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0 + 1e-9, s"$qid range")
      }
    }
  }

  test("funnel_significance replays a local windowed funnel and 2x2 chi-square") {
    val rows = Experiment.funnelSignificance(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val win = Experiment.FunnelWindowUs
    val steps = ev.groupBy(_._1).map { case (uid, es) =>
      val tv = es.collect { case (_, "view", t) => t }.minOption
      val tc = tv.flatMap(v =>
        es.collect { case (_, "click", t) if t > v && t <= v + win => t }.minOption)
      val tp = tc.flatMap(c =>
        es.collect { case (_, "purchase", t) if t > c && t <= c + win => t }.minOption)
      uid -> (if (tp.isDefined) 3 else if (tc.isDefined) 2 else if (tv.isDefined) 1 else 0)
    }
    val variant = (uid: Long) =>
      graft.expressions.CrossHash.md5Mod(s"ab-$uid") % 2
    (1 to 3).foreach { k =>
      val entered = steps.filter(_._2 >= k - 1)
      val a = entered.filter(e => variant(e._1) == 0)
      val b = entered.filter(e => variant(e._1) == 1)
      val r = rows(k.toLong)
      assert(r.getLong(1) == a.size && r.getLong(3) == b.size, s"step $k entered")
      assert(r.getLong(2) == a.count(_._2 >= k), s"step $k conv_a")
      assert(r.getLong(4) == b.count(_._2 >= k), s"step $k conv_b")
    }
    // a deterministic hash split carries NO treatment effect: nothing
    // may come out significant on this corpus
    rows.values.foreach(r => assert(r.isNullAt(8) || !r.getBoolean(8)))
    // the windowed funnel must actually narrow (non-degenerate test)
    assert(rows(2L).getLong(2) < rows(1L).getLong(1))
  }

  test("ab_srm equals a local chi-square replay of the hash split") {
    val r = Experiment.abSrm(spark, sf).head()
    val (na, nb, chi2, flag) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))
    val users = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(na + nb == users)
    val d = na - nb
    val exp = BigDecimal(d.toDouble * d / (na + nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(chi2 - exp) < 1e-9)
    assert(flag == (d * d * 1000 > 3841 * (na + nb)))
    // a healthy deterministic 50/50 hash split must NOT trip SRM
    assert(!flag, s"md5 split flagged SRM: n_a=$na n_b=$nb")
  }
}
