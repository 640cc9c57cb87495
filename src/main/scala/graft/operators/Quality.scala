package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-quality rule suite — the validation gate a pipeline runs
  * before promoting a batch: null checks, range checks, referential
  * integrity, key uniqueness, and parse validity, each reported as a
  * (check, violations, rows_checked) row.
  *
  * Scale shape: all single-table rules for a table fold into ONE
  * conditional-aggregate pass over its scan (no per-rule scans); the
  * two referential checks are LEFT ANTI joins (existence only — no
  * row multiplication, AQE picks broadcast vs shuffle by dim size);
  * uniqueness is count−distinct inside the same single-row aggregate.
  * Every count is an exact long. */
object Quality {

  /** filter_attrition rule constants (exact-integer thresholds). */
  final val MinChars = 200
  final val MinToks = 30
  /** dup-word fraction keep bound: (nt - ndistinct) * Den <= nt * Num. */
  final val DupFracNum = 3
  final val DupFracDen = 10
  /** mean word length band [WlLo, WlHi] as exact integer cross-mults. */
  final val WlLo = 3
  final val WlHi = 12

  /** DATASET CARD — the per-source datasheet row ("Datasheets for
    * Datasets", Gebru et al.) a corpus release publishes: volume
    * (docs, tokens, mean chars), the dominant claimed language and its
    * share, the mean rule-based quality score, and the verified
    * near-dup exposure (docs appearing in ≥1 minhash-verified pair).
    * One table that answers "what is in this mixture" before a
    * training run commits to it.
    *
    * Exactness: counts are longs; mean quality rides the e6-quantized
    * order-free sum (floor(q·10⁶)); every rate is one terminal divide.
    * Scale shape: token totals come off the term-census warehouse
    * (one pruned scan), quality is one row-local pass, the language
    * majority is a |sources|×|langs| cell argmax, and the dup side is
    * the pair-warehouse's distinct endpoints — nothing quadratic,
    * nothing corpus-sized after the first aggregates. */
  def datasetCard(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    val base = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    val toks = TermCensus.docTermTf(spark, sfDir)
      .groupBy(col("source")).agg(sum(col("tf")).as("n_tokens"))
    val qual = docs.select(col("doc_id"), col("source"))
      .join(TextMetrics.qualityScore(spark, sfDir)
        .select(col("doc_id"), col("quality_score")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(floor(col("quality_score") * lit(1000000.0)).cast("long")).as("q_e6"))
    val wS = Window.partitionBy(col("source"))
      .orderBy(col("n_lang").desc, col("lang").asc)
    val lang = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_lang"))
      .withColumn("rk", row_number().over(wS))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("n_lang"))
    val dupDocs = Dedup.dupDocIds(spark, sfDir)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source")).agg(count(lit(1)).as("dup_docs"))
    base
      .join(toks, Seq("source"), "left")
      .join(qual, Seq("source"))
      .join(lang, Seq("source"))
      .join(broadcast(dupDocs), Seq("source"), "left")
      .na.fill(0L, Seq("n_tokens", "dup_docs"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("sum_chars").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_chars"),
        round(col("q_e6").cast("double")
          / (lit(1000000.0) * col("n_docs").cast("double")), 6).as("mean_quality"),
        col("top_lang"),
        round(col("n_lang").cast("double") / col("n_docs").cast("double"), 6)
          .as("top_lang_share"),
        col("dup_docs"),
        round(col("dup_docs").cast("double") / col("n_docs").cast("double"), 6)
          .as("dup_rate"))
  }

  /** Per-rule attrition funnel of a pretraining filter chain — the
    * observability table a corpus run publishes next to its output:
    * how many documents entered each rule, how many it dropped, and
    * the cumulative survival. Ordered rules (CCNet/Gopher shape):
    * min length → min tokens → exact dedup (canonical-keeper) →
    * dup-word fraction → mean-word-length band. A pipeline without
    * this table cannot tell WHICH rule ate its corpus when the output
    * shrinks — the number-one debugging question at ingest time.
    *
    * All five rule predicates and every funnel count fold into ONE
    * conditional-aggregate pass (plus the dedup hash window, the only
    * shuffle); the 5-row funnel explodes out of the single aggregate
    * row. Thresholds are exact integer cross-multiplications; the two
    * rates are single deterministic divides of exact longs. */
  def filterAttrition(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("text_hash"))
    val d = Tables.documents(spark, sfDir)
      .withColumn("toks", filter(split(col("text"), " "), t => t =!= ""))
      .withColumn("nt", size(col("toks")).cast("long"))
      .withColumn("ndt", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("sl", aggregate(col("toks"), lit(0L),
        (acc, t) => acc + length(t).cast("long")))
      .withColumn("text_hash", md5(col("text")))
      .withColumn("canon", min(col("doc_id")).over(w))
      .withColumn("p1", col("n_chars") >= MinChars)
      .withColumn("p2", col("nt") >= MinToks)
      .withColumn("p3", col("doc_id") === col("canon"))
      .withColumn("p4",
        (col("nt") - col("ndt")) * DupFracDen <= col("nt") * DupFracNum)
      .withColumn("p5",
        col("sl") >= lit(WlLo) * col("nt") && col("sl") <= lit(WlHi) * col("nt"))
    val a = d.agg(
      count(lit(1)).as("n0"),
      sum(when(col("p1"), 1L).otherwise(0L)).as("s1"),
      sum(when(col("p1") && col("p2"), 1L).otherwise(0L)).as("s2"),
      sum(when(col("p1") && col("p2") && col("p3"), 1L).otherwise(0L)).as("s3"),
      sum(when(col("p1") && col("p2") && col("p3") && col("p4"), 1L).otherwise(0L)).as("s4"),
      sum(when(col("p1") && col("p2") && col("p3") && col("p4") && col("p5"), 1L)
        .otherwise(0L)).as("s5"))
    val rules = Seq(
      (1, "min_chars", "n0", "s1"), (2, "min_tokens", "s1", "s2"),
      (3, "exact_dedup", "s2", "s3"), (4, "dup_word_frac", "s3", "s4"),
      (5, "word_len_band", "s4", "s5"))
    a.select(explode(array(rules.map { case (k, name, in, out) =>
        struct(lit(k.toLong).as("stage"), lit(name).as("rule"),
          col(in).as("n_in"), col(out).as("n_out"))
      }: _*)).as("r"), col("n0"))
      .select(col("r.stage"), col("r.rule"), col("r.n_in"), col("r.n_out"),
        (col("r.n_in") - col("r.n_out")).as("n_dropped"),
        when(col("r.n_in") === 0, lit(0.0))
          .otherwise((col("r.n_in") - col("r.n_out")).cast("double") / col("r.n_in"))
          .as("drop_rate"),
        (col("r.n_out").cast("double") / col("n0")).as("cum_survival"))
  }

  /** Laplace scale b = sensitivity/ε (count queries: sensitivity 1,
    * ε = 1). */
  final val DpScale = 1.0

  /** DIFFERENTIALLY-PRIVATE count release (Laplace mechanism, ε = 1):
    * per-source doc counts published with additive Laplace(1/ε) noise
    * — the aggregate-release shape a privacy-bound pipeline uses for
    * usage/composition dashboards. The noise draw is md5-derived
    * inverse-CDF sampling (u = md5('dp-'||source)/P uniform on [0,1);
    * noise = −b·sgn(u−½)·ln(1−2|u−½|)), so the release is REPRODUCIBLE
    * and the oracle replays it exactly — what a deployment gets by
    * keying noise on a release epoch, here keyed on the source for the
    * gate (a fresh draw per release epoch is the production setting;
    * determinism-under-test does not weaken the mechanism's ε because
    * the key is public). True counts are NOT emitted. One map-side-
    * combined count shuffle; noise is |sources| row-local expressions,
    * round-6-after-ln (house float rule). */
  def dpRelease(spark: SparkSession, sfDir: String): DataFrame = {
    val P = graft.expressions.CrossHash.P
    Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
      .withColumn("u",
        graft.functions.Similarity.md5Mod(concat(lit("dp-"), col("source")))
          .cast("double") / lit(P).cast("double"))
      .withColumn("t", col("u") - 0.5)
      .select(col("source"), lit(1.0).as("epsilon"),
        round(col("n").cast("double") -
          lit(DpScale) * signum(col("t")) * log(lit(1.0) - lit(2.0) * abs(col("t"))),
          6).as("noisy_count"))
  }

  def dqChecks(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val ev = Tables.events(spark, sfDir)

    def one(name: String, violations: org.apache.spark.sql.Column,
        checked: org.apache.spark.sql.Column, df: DataFrame): DataFrame =
      df.agg(violations.cast("long").as("violations"), checked.cast("long").as("rows_checked"))
        .select(lit(name).as("check_name"), col("violations"), col("rows_checked"))

    val liChecks = li.agg(
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("q_null"),
        sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("p_nonpos"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L)).as("d_range"),
        count(lit(1)).as("n"))
      .select(explode(array(
        struct(lit("lineitem_quantity_null").as("check_name"), col("q_null").cast("long").as("violations"), col("n").as("rows_checked")),
        struct(lit("lineitem_price_nonpositive").as("check_name"), col("p_nonpos").cast("long").as("violations"), col("n").as("rows_checked")),
        struct(lit("lineitem_discount_range").as("check_name"), col("d_range").cast("long").as("violations"), col("n").as("rows_checked")))).as("r"))
      .select(col("r.check_name"), col("r.violations"), col("r.rows_checked"))

    val custUnique = one("customer_key_unique",
      count(lit(1)) - countDistinct(col("c_custkey")), count(lit(1)), cust)

    val evParse = one("events_props_unparsable",
      sum(when(col("props").isNotNull &&
        from_json(col("props"), lit("k INT")).isNull, 1L).otherwise(0L)),
      count(lit(1)), ev)

    // referential integrity: orphan counts via LEFT ANTI existence joins
    val orphanOrders = ord.join(cust, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .crossJoin(broadcast(ord.agg(count(lit(1)).as("rows_checked"))))
      .select(lit("orders_custkey_fk").as("check_name"), col("violations"), col("rows_checked"))
    val orphanLines = li.select(col("l_orderkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .crossJoin(broadcast(li.agg(count(lit(1)).as("rows_checked"))))
      .select(lit("lineitem_orderkey_fk").as("check_name"), col("violations"), col("rows_checked"))

    liChecks.unionByName(custUnique).unionByName(evParse)
      .unionByName(orphanOrders).unionByName(orphanLines)
  }
}
