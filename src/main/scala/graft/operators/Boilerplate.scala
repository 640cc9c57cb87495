package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Per-source PREFIX BOILERPLATE detection — the crawl-cleanup stage
  * that finds the shared header every document from a source carries
  * (mirror banners, license headers, template preambles) so it can be
  * stripped before dedup/training (left in, boilerplate dominates
  * shingle sets and inflates near-dup rates).
  *
  * The trick that makes it ONE aggregation instead of a per-source
  * reduce: the longest common prefix of a SET of strings equals the
  * LCP of its lexicographic MIN and MAX alone — any divergence from
  * the set's common prefix shows up in whichever element sorts first
  * or last. So the whole operator is min(text)/max(text) per source
  * (map-side combinable) followed by a row-local LCP over |sources|
  * rows — no pairwise comparison, no second corpus pass, scales as a
  * single agg at any corpus size.
  *
  * A deterministic per-source header (varying past the common part
  * via doc_id) is prepended in BOTH engines, since the synthetic
  * corpus has no native boilerplate. */
object Boilerplate {

  /** Length of the common prefix of two strings (linear: char arrays
    * zipped, first mismatch position). When one string is a strict
    * prefix of the other, zip_with pads the shorter array with nulls so
    * x === y is null (never false) past its end — the not-found branch
    * must therefore return the SHORTER length, not size(eq). */
  def lcpLen(a: Column, b: Column): Column = {
    val eq = zip_with(split(a, ""), split(b, ""),
      (x: Column, y: Column) => x === y)
    val firstFalse = array_position(eq, lit(false))
    when(firstFalse === 0, least(length(a), length(b)))
      .otherwise(firstFalse - 1).cast("long")
  }

  def prefixBoilerplate(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), length(col("text")).cast("long").as("raw_len"),
        concat(lit("archive of "), col("source"), lit(" :: volume "),
          pmod(col("doc_id"), lit(3)), lit(" :: "), col("text")).as("t"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("t")).as("mn"), max(col("t")).as("mx"),
        sum(length(col("t")).cast("long")).as("total_chars"))
      .withColumn("lcp_len", lcpLen(col("mn"), col("mx")))
      .select(col("source"), col("n_docs"), col("lcp_len"),
        // head of the COMMON prefix only (min string cut at lcp_len)
        expr("substring(mn, 1, cast(least(24L, lcp_len) as int))").as("lcp_head"),
        round(col("lcp_len").cast("double") * col("n_docs").cast("double")
          / col("total_chars").cast("double"), 6).as("boiler_frac"))
  }
}
