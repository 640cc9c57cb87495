package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Reference injection — the Spark form of the reference's wd2tei stage
  * (script/wd2tei.py:34), which joins the name→wikidata-ID mapping back
  * onto each catalogue document and sets `@ref="wd:Qxxx"` on the first
  * matching name element.
  *
  * Spark-first shape: the id mapping is a small table → **broadcast
  * theta-join** (term containment), then a window picks the earliest
  * occurrence per document, and the rewrite is pure string expressions
  * (position + splice) inside whole-stage codegen. No driver loop, no
  * UDF; documents shard freely because each row rewrites independently.
  */
object RefInject {

  /** term → wikidata-style id mapping (the nametable_out of our corpus). */
  val mapping: Seq[(String, String)] = Seq(
    "spark" -> "Q101", "join" -> "Q102", "window" -> "Q103",
    "stream" -> "Q104", "customer" -> "Q105")

  def refInject(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      // pad with spaces so ' term ' matches whole tokens only
      .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
    val map = mapping.toDF("term", "wd")

    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"), col("term"))
    docs.join(broadcast(map),
        expr("instr(padded, concat(' ', term, ' '))") > 0)
      .withColumn("pos", expr("instr(padded, concat(' ', term, ' '))"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(
        col("doc_id"), col("term"), col("wd"),
        // splice <name ref="wd:QN">term</name> over the first occurrence
        trim(concat(
          expr("substring(padded, 1, pos)"),
          lit("<name ref=\"wd:"), col("wd"), lit("\">"), col("term"),
          lit("</name>"),
          expr("substring(padded, pos + length(term) + 1)"))).as("text_ref"))
  }
}
