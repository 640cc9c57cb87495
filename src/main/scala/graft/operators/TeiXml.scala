package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** XML item extraction — the Spark form of the reference's nametable
  * builder (script/utils/nametable.py:19), which parses TEI catalogues
  * and emits one (xml_id, name, trait) row per tei:item.
  *
  * The engine treats XML as a string column and extracts fields with
  * Spark's built-in `xpath_*` expressions, so extraction is distributed
  * and codegen-adjacent — no driver-side DOM, no Python row loop. Here
  * the item XML is materialized deterministically from the documents
  * table (the harness ships parquet, not XML) and then parsed back —
  * the parse path is exactly what a real TEI ingest would run after
  * `spark.read.text`/`wholetext` on catalogue files.
  */
object TeiXml {

  /** Build a TEI-ish <item> per document, then xpath the fields out. */
  def teiExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val withXml = docs.select(
      col("doc_id"),
      format_string(
        "<item xml:id=\"CAT_%d\"><name type=\"author\">%s</name><trait><p>%s</p></trait></item>",
        col("doc_id"), col("source"), substring(col("text"), 1, 40)).as("xml"))
    // from_xml parses each item once into a struct — four separate
    // xpath_string calls would re-parse the document per field
    // (attributes surface as `_name`; element text as `_VALUE`)
    withXml
      .select(col("doc_id"), from_xml(col("xml"), lit(
        "struct<`_xml:id`:string, name:struct<_VALUE:string,_type:string>, trait:struct<p:string>>"),
        java.util.Map.of("ignoreSurroundingSpaces", "false")).as("it"))
      .select(col("doc_id"),
        col("it.`_xml:id`").as("xml_id"),
        col("it.name._VALUE").as("name"),
        col("it.trait.p").as("trait"),
        col("it.name._type").as("name_type"))
  }
}
