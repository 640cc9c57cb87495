package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Tokenizer-training primitives.
  *
  * `bpePairs` is the first iteration of byte-pair-encoding vocabulary
  * training (Sennrich et al. 2016): count every adjacent symbol pair
  * across the corpus, weighted by word frequency — the merge
  * candidates. The scale shape matters more than the arithmetic:
  * aggregate words FIRST (the corpus collapses from O(tokens) rows to
  * O(vocabulary) rows — at 100 TB that is a 4-6 order-of-magnitude
  * reduction), then explode each distinct word's character pairs once
  * and multiply by its count. Exploding pairs per occurrence instead
  * of per distinct word would shuffle the whole corpus.
  */
object Tokenize {

  /** Top-50 adjacent character pairs by weighted count (count desc,
    * pair asc tiebreak — fully deterministic). The top-k is a
    * TakeOrdered over the pair aggregate: bounded driver result, no
    * global sort. */
  /** Vocabulary cap for vocabCoverage. */
  final val VocabSize = 1000

  /** Tokenizer vocabulary truncation: the top-V terms by corpus
    * frequency with each term's rank and the cumulative fraction of
    * all tokens covered — the curve that picks a vocab size / measures
    * the OOV rate.
    *
    * Vocabulary-first: the corpus collapses to per-term counts in one
    * map-side-combined shuffle; the GLOBAL top-V then runs through the
    * bounded-heap TopK operator with no grouping (its AllTuples path) —
    * every map task forwards at most V rows, so no global sort of the
    * vocabulary ever happens. The rank/cumsum window orders V rows in
    * one bounded partition, and the total-token count joins as a
    * broadcast scalar. Coverage = exact-long cumsum / exact-long total:
    * one IEEE divide, bit-stable. */
  def vocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("term"))
    counts
      .transform(graft.plans.TopK.perGroup(Seq(), Seq("cnt" -> false, "term" -> true), VocabSize))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("cnt")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(total))
      .select(col("term"), col("cnt"), col("rank"),
        (col("cum").cast("double") / col("total").cast("double")).as("cum_coverage"))
  }

  def bpePairs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      // length >= 2: Spark's sequence(1, 0) would run DESCENDING and
      // fabricate pairs for single-character words
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(col("wc"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(50)
}
