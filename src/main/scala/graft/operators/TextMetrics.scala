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

  /** Unigram rarity scoring: word frequencies learned from the corpus
    * itself (one agg), broadcast back, and every document scored by its
    * tokens' corpus frequencies — the cheap fluency proxy pretraining
    * filters use (integer-exact aggregates, so parallel summation is
    * bit-stable; a log-prob variant would be order-sensitive doubles).
    * The self-derived-model shape: aggregate → broadcast join → score,
    * no driver round-trip. */
  def unigramScore(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val freqs = words.groupBy(col("word")).agg(count(lit(1)).as("wc"))
    words.join(broadcast(freqs), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("wc")).as("sum_wc"),
        sum((col("wc") === 1).cast("long")).as("hapax_tokens"),
        min(col("wc")).as("rarest_wc"))
      .withColumn("mean_wc", col("sum_wc").cast("double") / col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("sum_wc"),
        col("hapax_tokens"), col("rarest_wc"), col("mean_wc"))
  }

  /** PII-style redaction: masks email-shaped tokens, long digit runs,
    * and phone-shaped sequences via codegen'd regexp chains (the
    * pattern set is a stand-in; a production list drops in). */
  def textRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      // the corpus is clean lowercase words; synthesize findable PII
      // deterministically so the redaction path is exercised
      .withColumn("dirty", concat(col("text"),
        lit(" user"), col("doc_id"), lit("@example.com code "),
        (col("doc_id") * 37 + 1234567890L).cast("string")))
    docs.select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("dirty"), "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
          "[0-9]{7,}", "<NUM>").as("redacted"))
  }

  /** Per-language corpus summary: the profiling table a pipeline run
    * emits before/after filtering. */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
        avg(col("n_chars")).as("avg_chars"),
        count_distinct(md5(col("text"))).as("distinct_texts"))

  /** The end-to-end pretraining filter: language-ID confidence, a
    * quality threshold, and exact dedup composed into ONE declarative
    * plan — what a corpus run executes before tokenization. Catalyst
    * fuses the three scans' projections; each component is itself
    * gate-verified, so the composition inherits their oracles. */
  def corpusFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val quality = qualityScore(spark, sfDir).select(col("doc_id"), col("quality_score"))
    val lang = langId(spark, sfDir).select(col("doc_id"), col("pred_lang"), col("votes"))
    val dup = Dedup.dedupExact(spark, sfDir).select(col("doc_id"), col("is_dup"))
    quality.join(lang, Seq("doc_id")).join(dup, Seq("doc_id"))
      .filter(!col("is_dup") && col("votes") >= 1 && col("quality_score") >= 0.5)
      .select(col("doc_id"), col("pred_lang"), col("quality_score"))
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
