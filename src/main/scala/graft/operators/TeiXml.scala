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
    withXml.select(
        col("doc_id"),
        // the xml: prefix is unresolvable in Spark's (Hive UDFXPathUtil)
        // xpath engine — match the reserved-namespace attr by local name
        expr("xpath_string(xml, \"/item/@*[local-name()='id']\")").as("xml_id"),
        expr("xpath_string(xml, '/item/name')").as("name"),
        expr("xpath_string(xml, '/item/trait/p')").as("trait"),
        expr("xpath_string(xml, '/item/name/@type')").as("name_type"))
      .orderBy(col("doc_id"))
  }
}
