package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NameFunctions
import graft.sources.Tables

/** Query bindings for the reference-pipeline stage A operators
  * (SURVEY.md §2.A): each applies a column-level NameFunctions
  * transform to a test table with deterministic output ordering.
  */
object ReferenceOps {

  /** Lowercase/strip/collapse normalization + parenthetical split over
    * customer names (reference: itemtoid_prep.py:47,289). The input is
    * recast to catalogue shape — "lname (fname)" — so the split path
    * is exercised on every row. */
  def nameNormalize(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .withColumn("cat_name",
        concat(col("c_name"), lit(" (nr "), col("c_custkey").cast("string"), lit(")")))
      .select(col("c_custkey"), col("cat_name"),
        NameFunctions.normalizeName(col("cat_name")).as("name_norm"),
        NameFunctions.normalizeName(NameFunctions.mainName(col("cat_name"))).as("lname"),
        NameFunctions.normalizeName(NameFunctions.parentheticalName(col("cat_name"))).as("fname"))

  /** Broadcast-map expansion of abbreviated tokens in document text
    * (reference: rgx.py:120). */
  def abbrevExpand(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        NameFunctions.expandAbbrev(col("text")).as("text_expanded"))

  /** Rule-cascade kind classification over document text
    * (reference: itemtoid_prep.py:56-205). */
  def nameClassify(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        NameFunctions.classifyName(col("text")).as("kind"))

  /** "le même" fill-forward as a standalone query (reference:
    * itemtoid_prep.py:14 CASE 1): rows deterministically marked as
    * "le même" inherit the nearest preceding real name within their
    * partition — the sequential carry rewritten as an ordered-window
    * last-non-null. */
  def nameFillforward(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val raw = when(pmod(col("doc_id"), lit(7)) === 3, lit("le même")).otherwise(col("source"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.documents(spark, sfDir)
      .withColumn("raw_name", raw)
      .withColumn("filled_name",
        coalesce(last(when(col("raw_name") =!= "le même", col("raw_name")),
          ignoreNulls = true).over(w), col("raw_name")))
      .select(col("doc_id"), col("lang"), col("raw_name"), col("filled_name"))
  }

  /** Occupation terms used to synthesize traits for the gate query —
    * drawn from the reference's functions table so extraction exercises
    * real keys (one per doc plus a marshal co-mention every 3rd doc to
    * hit the priority rules). */
  val occupationSample: Seq[String] = Seq("général", "maréchal", "écrivain",
    "peintre", "chimiste", "empereur", "député", "musicien", "acteur", "médecin")

  /** Occupation extraction from a synthesized trait (reference:
    * itemtoid_prep.py:305-341 extracts functions and reduces them by
    * priority). */
  def occupationExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val t = typedlit(occupationSample)
    Tables.documents(spark, sfDir)
      .withColumn("trait", concat(
        lit("Né en 1800. "), element_at(t, (pmod(col("doc_id"), lit(10)) + 1).cast("int")),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(" et maréchal")).otherwise(lit("")),
        lit(" de France.")))
      .select(col("doc_id"), col("trait"),
        NameFunctions.occupationExtract(col("trait")).as("occupation"))
  }

  /** Title samples for the nobility gate query — real keys of the
    * reference's status table plus a bare name case. */
  val statusSample: Seq[String] = Seq("reine", "duc de", "comtesse palatine de",
    "baron", "cardinal", "")

  /** Nobility-title handling over synthesized catalogue names
    * (reference: itemtoid_prep.py:211-240 + matching.py:85 status):
    * detect a title, emit its wikidata translation, strip it plus the
    * particles to the searchable surname. */
  def nameStatus(spark: SparkSession, sfDir: String): DataFrame = {
    val t = typedlit(statusSample)
    // spread: three giant status-alternation regex passes per row over
    // a single-row-group test scan otherwise run as ONE task (measured
    // 1.16s serial at sf0.1, the whole operator); the shuffled rows are
    // two narrow columns — the shingled()/Ann spread discipline
    graft.operators.Partitioning.spread(
        Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name")))
      .withColumn("name", trim(concat(
        element_at(t, (pmod(col("c_custkey"), lit(6)) + 1).cast("int")),
        lit(" "), col("c_name"))))
      .select(col("c_custkey"), col("name"),
        NameFunctions.hasStatus(col("name")).as("has_status"),
        NameFunctions.statusTitles(col("name")).as("status_title"),
        NameFunctions.stripStatus(col("name")).as("surname"))
  }

  /** Birth/death year extraction from a trait string (reference:
    * itemtoid_prep.py:293-303). The trait is synthesized
    * deterministically per doc — the parquet corpus carries no dates —
    * and the regex path is exactly the production one. */
  def yearExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("trait",
        concat(lit("N. "), (lit(1800) + pmod(col("doc_id"), lit(150))).cast("string"),
          lit(" M. "), (lit(1820) + pmod(col("doc_id"), lit(160))).cast("string")))
      .select(col("doc_id"), col("trait"),
        NameFunctions.birthYear(col("trait")).cast("int").as("birth_year"),
        NameFunctions.deathYear(col("trait")).cast("int").as("death_year"))
}
