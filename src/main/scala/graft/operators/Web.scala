package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Web-corpus preparation: URL canonicalization + canonical-URL dedup —
  * the first stage every crawl-derived training corpus runs (the same
  * document is fetched as `HTTP://WWW.Host.com:80/a/?utm_source=x&b=1`
  * and `http://host.com/a?b=1`; treating those as distinct multiplies
  * the corpus by its mirror count).
  *
  * Canonicalization rules (the conservative common core of the
  * RFC 3986 §6 normalizations a crawler applies):
  *   - scheme and host lowercase; leading `www.` stripped
  *   - default port dropped (`:80` for http, `:443` for https);
  *     non-default ports kept
  *   - trailing `/` stripped from the path
  *   - fragment dropped
  *   - query: `utm_*` tracking params dropped, remaining params sorted
  *
  * Scale shape: canonicalization is 100% row-local string expressions
  * (codegen'd, no UDF, no shuffle), and the dedup is ONE hash
  * aggregation on the canonical key — the same cost as dedup_exact.
  * The URL column is synthesized deterministically from the documents
  * table (the harness ships parquet, not a crawl), with case noise,
  * default and non-default ports, trailing slashes, utm params,
  * unsorted query params, and fragments injected per doc_id so every
  * rule fires; the oracle synthesizes and canonicalizes the same URLs
  * in SQL, so a wrong rule fails the hash compare. */
object Web {

  /** Raw URL per document — deterministic mirror-noise grammar. The
    * variant knobs use moduli COPRIME to the source's period (source =
    * src(doc_id % 20), so any knob on a divisor of 20 would be constant
    * within a source and distinct raws could never canonicalize
    * together — the first grammar draft had exactly that bug). With 3,
    * 7, 9, 11, 13, 17 every mirror family mixes www/case/port/slash/
    * tracking variants of the same logical page. */
  private def rawUrl: Column =
    concat(
      // scheme case noise + https subset
      when(pmod(col("doc_id"), lit(7)) === 0, lit("HTTPS"))
        .when(pmod(col("doc_id"), lit(7)) <= 3, lit("HTTP"))
        .otherwise(lit("http")),
      lit("://"),
      // host case noise + www prefix on a third of the docs
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit("WWW."), col("source"), lit(".Example.COM")))
        .otherwise(concat(col("source"), lit(".example.com"))),
      // ports: default-for-http, explicit 443, genuinely non-default, none
      when(pmod(col("doc_id"), lit(11)) === 0, lit(":80"))
        .when(pmod(col("doc_id"), lit(11)) === 1, lit(":443"))
        .when(pmod(col("doc_id"), lit(11)) === 2, lit(":8080"))
        .otherwise(lit("")),
      format_string("/Docs/%d", pmod(col("doc_id"), lit(13))),
      when(pmod(col("doc_id"), lit(9)) === 0, lit("/")).otherwise(lit("")),
      // query: tracking params + order noise
      when(pmod(col("doc_id"), lit(17)) < 8,
        format_string("?utm_source=feed&b=%d&a=1", pmod(col("doc_id"), lit(4))))
        .otherwise(format_string("?a=1&b=%d", pmod(col("doc_id"), lit(4)))),
      when(pmod(col("doc_id"), lit(9)) === 1,
        format_string("#sec%d", pmod(col("doc_id"), lit(4)))).otherwise(lit("")))

  /** Row-local canonicalization of `url` (see rules above). */
  def canonicalUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val prefix = substring_index(noFrag, "?", 1)
    val qs = when(noFrag.contains("?"), substring_index(noFrag, "?", -1))
      .otherwise(lit(""))
    val scheme = lower(substring_index(prefix, "://", 1))
    val rest = substring_index(prefix, "://", -1)
    val hostport = substring_index(rest, "/", 1)
    val path = rest.substr(length(hostport) + 1, length(rest))
    val host = regexp_replace(lower(substring_index(hostport, ":", 1)), "^www\\.", "")
    val port = when(hostport.contains(":"), substring_index(hostport, ":", -1))
      .otherwise(lit(""))
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") || (scheme === "https" && port === "443"))
    val cPath = regexp_replace(path, "/$", "")
    val params = array_sort(filter(split(qs, "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    val cQuery = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      cPath, cQuery)
  }

  /** Gate query: canonicalize every document URL, then group — one
    * row per canonical URL with its mirror-family stats. */
  def dedupUrl(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), rawUrl.as("url"))
      .select(col("doc_id"), col("url"), canonicalUrl(col("url")).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("url")).as("n_variants"),
        min(col("doc_id")).as("rep_doc"))
}
