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

  def bm25Rank(spark: SparkSession, sfDir: String): DataFrame = {
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
      .transform(graft.plans.TopK.perGroup(
        Seq("query_id"), Seq("score" -> false, "doc_id" -> true), TopN))
  }
}
