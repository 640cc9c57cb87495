package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Semi-structured ingest: shred a nested JSON column (object +
  * string array + nested object + numeric array) into relational rows
  * and aggregate — the VARIANT-column workload every log/API corpus
  * starts with. The JSON is synthesized deterministically from the
  * documents table, so Spark GENUINELY parses (one from_json per row,
  * codegen'd Jackson) while the oracle derives the same cells
  * arithmetically — a parse that dropped a field, mis-nested a path,
  * or mis-indexed an array diverges from the oracle immediately.
  *
  * Scale shape: parse + explode are row-local (fan-out = |tags| = 2),
  * then ONE hash aggregation on (tag, lang). No UDF, no second pass.
  */
object Shred {

  private val jsonSchema =
    "struct<id:bigint, tags:array<string>, meta:struct<lang:string, n:bigint>, scores:array<bigint>>"

  def jsonShred(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        format_string(
          """{"id": %d, "tags": ["t%d", "u%d"], "meta": {"lang": "%s", "n": %d}, "scores": [%d, %d, %d]}""",
          col("doc_id"), pmod(col("doc_id"), lit(5)), pmod(col("doc_id"), lit(7)),
          col("lang"), col("n_chars"),
          pmod(col("doc_id"), lit(3)), pmod(col("doc_id"), lit(11)),
          pmod(col("doc_id"), lit(13))).as("props"))
    docs
      .select(from_json(col("props"), lit(jsonSchema)).as("p"))
      .select(col("p.id").as("id"), col("p.meta.lang").as("lang"),
        col("p.meta.n").as("n"),
        expr("aggregate(p.scores, 0L, (a, s) -> a + s)").as("score_sum"),
        explode(col("p.tags")).as("tag"))
      .groupBy(col("tag"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("score_sum")).as("scores_total"),
        sum(col("n")).as("chars_total"),
        count_distinct(col("id")).as("n_ids"))
  }
}
