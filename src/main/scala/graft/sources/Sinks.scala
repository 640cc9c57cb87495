package graft.sources

import org.apache.spark.sql.DataFrame

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

  /** Rewritten document text, one line per doc. */
  def writeText(df: DataFrame, textCol: String, path: String): Unit =
    df.select(textCol).write.mode("overwrite").text(path)
}
