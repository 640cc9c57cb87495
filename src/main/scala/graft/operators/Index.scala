package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Inverted-index construction — the retrieval-side primitive of a
  * RAG/search pipeline: term → document frequency + a capped, sorted
  * posting list.
  *
  * Scale shape: postings are capped at K per term BEFORE any
  * collect_list materializes, via the bounded-heap TopKPerGroup
  * operator — shuffle volume is K × vocabulary, independent of corpus
  * size, and no single term (stopwords are the classic skew key) can
  * blow up a reduce task by dragging its full posting list through
  * the exchange. Document frequency still counts ALL postings — that
  * aggregate combines map-side into one long per term. */
object Index {

  final val PostingsCap = 20

  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val postings = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("term"))
      .filter(col("term") =!= "")
    val df_ = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val capped = postings
      .transform(graft.plans.TopK.perGroup(Seq("term"), Seq("doc_id" -> true), PostingsCap))
      .groupBy(col("term"))
      .agg(array_join(array_sort(collect_list(col("doc_id"))), ",").as("postings"))
    df_.join(capped, Seq("term"))
  }
}
