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

  /** Mapping including an id-less term: the reference only sets `@ref`
    * when the mapper id is non-empty (wd2tei.py:71-73 `mapper[...] !=
    * ""`), so 'batch' must pass through every rewrite untouched. */
  val mappingAll: Seq[(String, String)] = mapping :+ ("batch" -> "")

  /** Full wd2tei parity on the flat documents table (wd2tei.py:34
    * wd_2_tei): rewrite EVERY occurrence of EVERY mapped term — the
    * reference loops all `tei:body//tei:name` elements, not just the
    * first — and declare the `wd:` prefix in a header column when the
    * document gained a ref (the XML path, WikidataPipeline.refInjectXml,
    * splices the same block into the encodingDesc).
    *
    * Spark-first shape: token-level `transform` over the split text —
    * one codegen'd pass per row, no join, no regex adjacency hazards,
    * exact whole-token semantics. Rows rewrite independently, so the
    * operator shards freely at any scale. */
  def refInjectAll(spark: SparkSession, sfDir: String): DataFrame = {
    val withId = mappingAll.filter(_._2.nonEmpty)
    val terms = withId.map(_._1)
    def markup(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      withId.foldRight(t) { case ((term, wd), acc) =>
        when(t === term,
          concat(lit("<name ref=\"wd:" + wd + "\">"), t, lit("</name>"))).otherwise(acc)
      }
    Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        size(filter(col("toks"), t => t.isInCollection(terms))).cast("long").as("n_refs"),
        array_join(transform(col("toks"), markup(_)), " ").as("text_ref"))
      .withColumn("header",
        when(col("n_refs") > 0, lit(WikidataPipeline.listPrefixDef)).otherwise(lit("")))
  }
}
