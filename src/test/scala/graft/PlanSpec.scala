package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan invariants — the properties that keep these operators
  * viable at 100 TB. A regression here (lost pushdown, a surprise
  * cartesian product, a dropped broadcast) changes cluster cost by
  * orders of magnitude long before any correctness test notices. */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(!p.contains("l_comment"), "scan must prune unused columns")
  }

  test("q3_join broadcasts dimensions and pushes all three filters") {
    val p = plan("q3_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"))
    assert(p.contains("GreaterThan(l_shipdate"))
    assert(p.contains("LessThan(o_orderdate"))
  }

  test("q5_starjoin has no cartesian or nested-loop join") {
    val p = plan("q5_starjoin")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("entity_match blocks the fuzzy join on an equi-key") {
    val p = plan("entity_match")
    // the levenshtein scoring must ride an equi join (hash/merge), never a cross
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("dedup operators never materialize an unblocked cross product") {
    for (q <- Seq("dedup_ngram", "dedup_minhash", "dedup_simhash", "dedup_embedding",
        "contamination_check", "corpus_filter", "enrich_wide", "name_status")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q contains an unblocked join")
    }
  }

  test("enrich_wide computes all attributes in a single aggregation shuffle") {
    val p = plan("enrich_wide")
    // one hash-partitioned Exchange (the per-customer agg); dimension
    // joins broadcast, so nothing else shuffles
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"expected at most one shuffle exchange, plan:\n$p")
  }

  test("contamination_check shuffles on the fingerprint, eval sizes broadcast") {
    val p = plan("contamination_check")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "eval sizes must broadcast")
  }

  test("ann_lsh joins candidates on the bucket equi-key") {
    val p = plan("ann_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("dedup_embedding blocks on (label, lsh bucket), never label alone") {
    val p = plan("dedup_embedding")
    // the candidate equi-join key must include the hyperplane bucket —
    // label-only blocking is quadratic inside a hot label
    assert(p.contains("bucket"), "join key must include the LSH bucket")
    assert(p.contains("hyperplane_lsh"))
  }

  test("itemToId reduces best-match via the bounded-heap TopK operator") {
    import org.apache.spark.sql.functions.col
    val d = java.nio.file.Files.createTempDirectory("graft_planspec")
    java.nio.file.Files.writeString(d.resolve("CAT_1.xml"),
      """<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body><list>
        |<item xml:id="CAT_1_e1"><name>hugo victor</name>
        | <trait><p>N. 1802 M. 1885.</p></trait></item>
        |</list></body></text></TEI>""".stripMargin)
    val cat = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey").cast("string").as("entity_id"),
        col("c_name").as("entity_name"))
    val df = graft.operators.WikidataPipeline.itemToId(spark, d.toString, cat)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("TopKPerGroup"), "best-match must plan as TopKPerGroupExec")
    assert(!p.contains("row_number"), "no window row_number in the match path")
  }

  test("doc_keywords top-5 plans as the bounded-heap TopK operator") {
    val p = plan("doc_keywords")
    assert(p.contains("TopKPerGroup"), "rank<=5 filter must rewrite to TopKPerGroupExec")
    assert(!p.contains("row_number"), "no window row_number in the keyword path")
  }

  test("sampling operators stay shuffle-free on the corpus pass") {
    for (q <- Seq("sample_stratified", "repetition_score")) {
      val p = plan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q must not shuffle the corpus")
    }
  }

  test("seq_pack windows only over bounded buckets, bucket offsets broadcast") {
    val p = plan("seq_pack")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "bucket offsets must broadcast back")
    // the within-bucket window partitions by (lang, bucket), never lang alone
    assert(p.contains("windowspecdefinition(lang") || p.contains("PartitionSpec: [lang"),
      s"plan must show the window specs:\n$p")
  }

  test("cluster_assign broadcasts centroid tables on both passes") {
    val p = plan("cluster_assign")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      "both centroid tables (seed + Lloyd) must broadcast")
  }

  test("word_count keeps partial aggregation map-side") {
    val p = plan("word_count")
    assert(p.contains("partial_count") || p.contains("HashAggregate"))
  }

  test("documents scans prune to referenced columns") {
    val p = plan("token_count")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("sample_group and bm25_rank reduce via the bounded-heap TopK operator") {
    for (q <- Seq("sample_group", "bm25_rank", "events_attribution")) {
      val p = plan(q)
      assert(p.contains("TopKPerGroup"), s"$q must plan TopKPerGroupExec")
      assert(!p.contains("row_number"), s"$q must not fall back to a window")
    }
    // vocab_coverage caps via global TopK FIRST; its rank window then
    // orders only the V surviving rows (bounded partition by design)
    val p = plan("vocab_coverage")
    assert(p.contains("TopKPerGroup"), "global top-V must use the bounded heap")
  }

  test("bloom_prune filters the fact scan before the join") {
    val p = plan("bloom_prune")
    assert(p.contains("might_contain"), "bloom membership filter must be in the plan")
    // formatted explain prints top-down: the join node must appear
    // BEFORE (above) the bloom Filter that guards the fact scan — a
    // might_contain evaluated above the join would prune nothing
    val filterPos = p.indexOf("might_contain")
    val joinPos = p.indexOf("HashJoin")
    assert(filterPos >= 0 && joinPos >= 0 && joinPos < filterPos,
      "bloom filter must sit below the join, on the scan side")
  }

  test("vocab-scale model joins carry no forced broadcast hint") {
    // unigram/bigram/df model tables grow with the corpus vocabulary;
    // a forced broadcast hint bypasses AQE's size check and OOMs the
    // driver at 100×. Only one-row scalar aggregates (vocab size,
    // n_docs) may keep a hint — so cap hinted joins at the scalar count.
    def hinted(name: String): Int = {
      val df: DataFrame = SparkEntry.queries(name)(spark, sf)
      "strategy=broadcast".r.findAllIn(df.queryExecution.optimizedPlan.toString).size
    }
    assert(hinted("unigram_score") == 0, "unigram freq join must be unhinted")
    assert(hinted("substring_dup") == 0, "duplicated-shingle join must be unhinted")
    assert(hinted("bigram_lm_score") <= 1, "only the one-row vocab agg may hint")
    assert(hinted("doc_keywords") <= 1, "only the one-row n_docs agg may hint")
  }

  test("q_cube expands grouping sets in a single aggregation pass") {
    val p = plan("q_cube")
    assert(p.contains("Expand"), "cube must plan one Expand, not a union of scans")
    // formatted explain prints each node twice (tree + detail):
    // 2 tables ⇒ at most 4 textual occurrences
    assert("Scan parquet".r.findAllIn(p).size <= 4, "one scan per table only")
  }

  test("graph_triangles joins stay equi-key, no cartesian wedge explosion") {
    val p = plan("graph_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("events_gapfill generates the grid distributed, no driver calendar") {
    val p = plan("events_gapfill")
    assert(p.contains("Generate") && p.contains("explode"),
      "sequence+explode must run in-plan")
    assert(!p.contains("CartesianProduct"))
  }
}
