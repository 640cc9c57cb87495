package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** BM25 full-text ranking — the retrieval scorer a RAG pipeline runs
  * over the corpus the inverted index (Index.scala) covers.
  *
  * The query set is a literal (a handful of terms), so every
  * corpus-level statistic it needs — N, avg doc length, per-term
  * document frequency — folds into ONE single-pass aggregate whose
  * 1-row result broadcasts back onto the scan. The per-document score
  * is then pure row-local expression work (higher-order array
  * functions, fully codegen'd): no join, no shuffle touches the corpus
  * until the final bounded-heap top-k, which moves K×|queries| rows.
  * Term additions are reduced in fixed query order, so Spark and the
  * oracle execute the identical IEEE sum.
  */
object Search {

  /** BM25 constants. */
  final val K1 = 1.2
  final val B = 0.75
  final val TopN = 10

  /** The literal query workload; oracle SQL is generated from the same
    * Seq so the two sides cannot drift. */
  val bm25Queries: Seq[(String, Seq[String])] = Seq(
    "q_spark" -> Seq("spark", "join"),
    "q_stream" -> Seq("window", "stream"),
    "q_mixed" -> Seq("customer", "batch", "merge"))

  private def distinctTerms: Seq[String] = bm25Queries.flatMap(_._2).distinct

  /** The full scored (query, doc) corpus with score > 0 — shared by
    * bm25_rank (bounded top-k) and negative_mining (truth anti-join
    * then bounded top-k); package-visible so specs can replay the
    * selection stages against it. */
  private[graft] def scoredCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("dl", size(filter(col("toks"), t => t =!= "")).cast("long"))

    // one pass: corpus size, total length, df per query term
    val statsAggs =
      Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
        distinctTerms.map(t =>
          sum(when(array_contains(col("toks"), t), 1L).otherwise(0L)).as(s"df_$t"))
    val stats = docs.agg(statsAggs.head, statsAggs.tail: _*)

    // idf and the length-normalized tf quotient, in fixed expression order
    def termScore(t: String): Column = {
      val tf = size(filter(col("toks"), x => x === t)).cast("double")
      val idf = log(lit(1.0) + (col("n_docs").cast("double") - col(s"df_$t").cast("double") + lit(0.5)) /
        (col(s"df_$t").cast("double") + lit(0.5)))
      idf * (tf * lit(K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl").cast("double") /
          (col("sum_dl").cast("double") / col("n_docs").cast("double"))))
    }
    val perQuery = bm25Queries.map { case (qid, terms) =>
      struct(lit(qid).as("query_id"),
        round(terms.map(termScore).reduce(_ + _), 6).as("score"))
    }
    docs.crossJoin(broadcast(stats))
      .select(col("doc_id"), explode(array(perQuery: _*)).as("qs"))
      .select(col("qs.query_id").as("query_id"), col("doc_id"), col("qs.score").as("score"))
      .filter(col("score") > 0)
  }

  def bm25Rank(spark: SparkSession, sfDir: String): DataFrame =
    scoredCorpus(spark, sfDir)
      .transform(graft.plans.TopK.perGroup(
        Seq("query_id"), Seq("score" -> false, "doc_id" -> true), TopN))

  /** Relevance truth: every query term must appear at least this many
    * times. tf ≥ 1 and tf ≥ 2 are DEGENERATE on this corpus (common
    * terms make ~25-60% of docs relevant, so BM25's top-10 scores a
    * trivial P@10 = 1); tf ≥ 3 measured P@10 = 0.8-0.9 — the metrics
    * actually discriminate. */
  final val EvalMinTf = 3

  /** RETRIEVAL QUALITY EVAL over the BM25 workload: P@k, MRR, and
    * AP@k of each query's top-k against a conjunctive ground truth (a
    * document is relevant iff it contains EVERY query term at least
    * EvalMinTf times) — the standard ranked-retrieval metrics a search
    * deployment tracks, here closing bm25_rank's loop the way ann_eval
    * closes ann_lsh's. BM25's length normalization can rank a
    * one-term-heavy doc above a contains-all doc, so the metrics are
    * non-trivial by construction.
    *
    * Exactness: ranks and hit counts are integers; MRR is one divide;
    * AP's precision-at-hit terms sum through the sorted-fold float
    * discipline (ann_eval's DCG pattern) and divide once by
    * min(n_relevant, k). A query spine keeps zero-relevant queries as
    * explicit rows. Scale shape: the truth side is one row-local
    * containment pass; everything after bm25's own bounded top-k is
    * k×|queries| rows. */
  /** The conjunctive tf ≥ EvalMinTf relevance truth — one row-local
    * containment pass; shared by search_eval (grades the ranking) and
    * negative_mining (anti-joins it away). */
  private def truthPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val truthBranches = bm25Queries.map { case (qid, terms) =>
      struct(lit(qid).as("query_id"),
        terms.map(t => size(filter(col("toks"), x => x === t)) >= EvalMinTf)
          .reduce(_ && _).as("relv"))
    }
    docs.select(col("doc_id"), explode(array(truthBranches: _*)).as("r"))
      .filter(col("r.relv"))
      .select(col("r.query_id").as("query_id"), col("doc_id"))
  }

  def searchEval(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val truth = truthPairs(spark, sfDir)
    val nRel = truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_relevant"))
    val wQ = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val rel = bm25Rank(spark, sfDir)
      .withColumn("rank", row_number().over(wQ).cast("long"))
      .join(broadcast(truth.withColumn("relv", lit(true))),
        Seq("query_id", "doc_id"), "left")
      .withColumn("relv", coalesce(col("relv"), lit(false)))
      .withColumn("cum_hits", sum(when(col("relv"), 1L).otherwise(0L)).over(
        Window.partitionBy(col("query_id")).orderBy(col("rank"))))
    val m = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_retrieved"),
        sum(when(col("relv"), 1L).otherwise(0L)).as("n_hits"),
        min(when(col("relv"), col("rank"))).as("first_rel"),
        sort_array(collect_list(when(col("relv"),
          col("cum_hits").cast("double") / col("rank").cast("double"))
          .otherwise(lit(0.0)))).as("gains"))
      .withColumn("ap_num", aggregate(col("gains"), lit(0.0), (a, x) => a + x))
    val spine = spark.range(1)
      .select(explode(typedLit(bm25Queries.map(_._1))).as("query_id"))
    spine
      .join(broadcast(nRel), Seq("query_id"), "left")
      .join(broadcast(m), Seq("query_id"), "left")
      .na.fill(0L, Seq("n_relevant", "n_retrieved", "n_hits"))
      .select(col("query_id"), col("n_relevant"), col("n_retrieved"), col("n_hits"),
        when(col("n_retrieved") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_hits").cast("double")
            / col("n_retrieved"), 6)).as("precision_at_k"),
        round(when(col("first_rel").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("first_rel")), 6).as("mrr"),
        when(least(col("n_relevant"), lit(TopN.toLong)) === 0L, lit(0.0))
          .otherwise(round(coalesce(col("ap_num"), lit(0.0))
            / least(col("n_relevant"), lit(TopN.toLong)), 6)).as("ap_at_k"))
  }

  /** GRADED-relevance retrieval eval: NDCG@k of the BM25 top-k against
    * tiered relevance (grade 1/2/3 for min-query-term tf 3/4/≥5 —
    * tiers measured populated: 29-40 / 4-15 / 0-5 docs per query at
    * sf0.01), the metric that rewards ranking the STRONGLY relevant
    * doc above the barely relevant one where P@k/MRR/AP (search_eval)
    * see only a binary hit.
    *
    * DCG terms use the natural-log discount: NDCG is invariant to the
    * log base (the constant factor cancels in DCG/IDCG), and ln is
    * the one logarithm both engines compute identically — log2 risks
    * a last-ulp split between a native log2 and ln(x)/ln(2). Per-rank
    * terms are row-local; sums fold ascending-sorted lists (the
    * ann_eval DCG discipline); IDCG's ideal ordering is a bounded-heap
    * top-k by grade. A query spine keeps zero-relevant queries
    * explicit. */
  def searchNdcg(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val gradeBranches = bm25Queries.map { case (qid, terms) =>
      val minTf = least(terms.map(t =>
        size(filter(col("toks"), x => x === t)).cast("long")): _*)
      struct(lit(qid).as("query_id"),
        when(minTf >= 5L, 3L).when(minTf === 4L, 2L)
          .when(minTf === 3L, 1L).otherwise(0L).as("grade"))
    }
    val truth = docs.select(col("doc_id"), explode(array(gradeBranches: _*)).as("r"))
      .filter(col("r.grade") > 0)
      .select(col("r.query_id").as("query_id"), col("doc_id"), col("r.grade").as("grade"))
    val wQ = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val d = bm25Rank(spark, sfDir)
      .withColumn("rank", row_number().over(wQ).cast("long"))
      .join(broadcast(truth), Seq("query_id", "doc_id"), "left")
      .na.fill(0L, Seq("grade"))
      .withColumn("term",
        col("grade").cast("double") / log(col("rank").cast("double") + 1.0))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_retrieved"),
        sum(when(col("grade") > 0, 1L).otherwise(0L)).as("n_rel_retrieved"),
        sort_array(collect_list(col("term"))).as("ts"))
      .withColumn("dcg", aggregate(col("ts"), lit(0.0), (a, x) => a + x))
    val wI = Window.partitionBy(col("query_id"))
      .orderBy(col("grade").desc, col("doc_id").asc)
    val ideal = truth
      .transform(graft.plans.TopK.perGroup(
        Seq("query_id"), Seq("grade" -> false, "doc_id" -> true), TopN))
      .withColumn("irank", row_number().over(wI).cast("long"))
      .withColumn("term",
        col("grade").cast("double") / log(col("irank").cast("double") + 1.0))
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(col("term"))).as("its"))
      .withColumn("idcg", aggregate(col("its"), lit(0.0), (a, x) => a + x))
    val spine = spark.range(1)
      .select(explode(typedLit(bm25Queries.map(_._1))).as("query_id"))
    spine
      .join(broadcast(d.select(col("query_id"), col("n_retrieved"),
        col("n_rel_retrieved"), col("dcg"))), Seq("query_id"), "left")
      .join(broadcast(ideal.select(col("query_id"), col("idcg"))),
        Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"),
        coalesce(col("n_rel_retrieved"), lit(0L)).as("n_rel_retrieved"),
        round(coalesce(col("dcg"), lit(0.0)), 6).as("dcg"),
        round(coalesce(col("idcg"), lit(0.0)), 6).as("idcg"),
        when(col("idcg").isNull, lit(null).cast("double"))
          .otherwise(round(col("dcg") / col("idcg"), 6)).as("ndcg"))
  }

  /** Hard negatives mined per query. */
  final val HardK = 10

  /** HARD-NEGATIVE MINING for retrieval-model training: per query,
    * the top-HardK BM25-scored documents that are NOT relevant under
    * the conjunctive truth — exactly the "BM25 negatives" recipe used
    * to build contrastive training pairs (DPR, Karpukhin et al. 2020):
    * lexically close enough to score high, semantically wrong by the
    * label. Deeper than bm25_rank's window by construction (a truth
    * doc in the top-k pushes a negative in from below), so it reuses
    * the full scored corpus, anti-joins the broadcast truth, and only
    * then takes the bounded-heap top-HardK — the corpus never
    * shuffles beyond K×|queries| rows; the rank decorates the
    * K×|queries| result, not the corpus. */
  def negativeMining(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val truth = truthPairs(spark, sfDir)
    scoredCorpus(spark, sfDir)
      .join(broadcast(truth.withColumn("relv", lit(true))),
        Seq("query_id", "doc_id"), "left")
      .filter(col("relv").isNull)
      .select(col("query_id"), col("doc_id"), col("score"))
      .transform(graft.plans.TopK.perGroup(
        Seq("query_id"), Seq("score" -> false, "doc_id" -> true), HardK))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }
}
