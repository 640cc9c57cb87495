package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Text-analysis operators over the documents table: marker-word
  * language ID, quality scoring, and token counting. All pure column
  * expressions (codegen'd); lang_id's marker table is a broadcast join.
  */
object TextMetrics {

  /** marker word → language votes (an n-gram/marker heuristic in the
    * spirit of CLD; tables are swappable per corpus). */
  val markers: Seq[(String, String)] = Seq(
    "the" -> "en", "a" -> "en", "fast" -> "en",
    "batch" -> "de", "window" -> "de",
    "merge" -> "fr", "sort" -> "fr",
    "filter" -> "es", "join" -> "es",
    "vector" -> "zh", "spark" -> "zh")

  /** Predict a language per document: explode tokens, join the marker
    * table (broadcast), count votes per (doc, lang), keep the top lang
    * (ties break alphabetically); docs with no marker hit → 'und'. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val marks = markers.toDF("word", "cand_lang")
    val votes = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(marks), Seq("word"))
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("votes").desc, col("cand_lang"))
    val top = votes.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("doc_id"), col("cand_lang").as("pred_lang"), col("votes"))
    docs.select(col("doc_id"), col("lang"))
      .join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("votes"), lit(0L)).as("votes"))
  }

  val stopwords: Seq[String] = WordCount.stopwords

  /** Quality metrics: word count, mean word length, stopword ratio, and
    * a bounded composite score — the heuristics a pretraining filter
    * (C4/Gopher-style) applies per document. */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val nWords = size(col("toks")).cast("double")
    val avgWlen = (length(col("text")) - (nWords - 1)) / nWords
    val stopHits = size(filter(col("toks"), t => t.isInCollection(stopwords))).cast("double")
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("avg_word_len", avgWlen)
      .withColumn("stopword_ratio", stopHits / nWords)
      .withColumn("quality_score",
        least(nWords / 100.0, lit(1.0)) * 0.4
          + (lit(1.0) - col("stopword_ratio")) * 0.3
          + least(col("avg_word_len") / 8.0, lit(1.0)) * 0.3)
      .select(col("doc_id"), col("n_words"), col("avg_word_len"),
        col("stopword_ratio"), col("quality_score"))
  }

  /** Whitespace and BPE-ish token counts. The regex splits letter runs
    * of ≤4 chars, digits, and single non-alphanumerics — a rough
    * stand-in for a byte-pair vocabulary's subword lengths. */
  def tokenCount(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .withColumn("ws_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("bpe_tokens",
        size(expr("regexp_extract_all(text, '[a-z]{1,4}|[0-9]|[^a-z0-9 ]', 0)")).cast("long"))
      .select(col("doc_id"), col("ws_tokens"), col("bpe_tokens"))
  }
}
