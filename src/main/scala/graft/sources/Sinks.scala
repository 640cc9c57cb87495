package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Output sinks mirroring the reference pipeline's artifacts:
  * nametable TSV (nametable.py writes tables/nametable_in.tsv), the
  * per-entity JSON attribute store (sparql.py writes one JSON per id
  * into out/wikidata/), and rewritten catalogue text (wd2tei.py).
  *
  * All are plain distributed writers — partitioned files, no driver
  * funnel; a downstream consumer globs the directory.
  */
object Sinks {

  /** Tab-separated with header — the reference's nametable format. */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .csv(path)

  /** JSON-lines attribute store (the scalable form of one-JSON-per-id:
    * one record per entity, partitioned by the writer). */
  def writeEntityJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** The reference's per-ID nested enrichment document
    * (sparql.py:381 wikidata_enrichments.json: one JSON object per
    * entity mapping attribute → LIST of values, empty list when the
    * OPTIONAL block bound nothing). Distributed form: JSON-lines,
    * one `{"id": ..., "attributes": {attr: [values...]}}` record per
    * entity — the single-object file the reference writes is a
    * driver funnel that cannot scale, while a line-per-entity store
    * globs back into the same dict. Every scalar column wraps into a
    * one-element array (null → empty array) and every array column
    * casts to array<string>, so the document schema is uniformly
    * attribute → [string], exactly the result_tojson shape
    * (utils/classes.py:163). */
  def writeEnrichmentDoc(df: DataFrame, idCol: String, path: String): Unit = {
    val attrs = df.schema.fields.filter(_.name != idCol).map { f =>
      val c = col(f.name)
      val arr = f.dataType match {
        case _: ArrayType => c.cast("array<string>")
        case _ => when(c.isNull, array().cast("array<string>"))
          .otherwise(array(c.cast("string")))
      }
      coalesce(arr, array().cast("array<string>")).as(f.name)
    }
    df.select(col(idCol).cast("string").as("id"),
        struct(attrs.toIndexedSeq: _*).as("attributes"))
      .write.mode("overwrite").json(path)
  }

  /** Rewritten document text, one line per doc. */
  def writeText(df: DataFrame, textCol: String, path: String): Unit =
    df.select(textCol).write.mode("overwrite").text(path)
}
