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
