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

  /** Abbreviation→full-form expansion table: the reference's curated
    * French first-name table (MatchingTables.names, matching.py:12)
    * plus the test corpus's clipped tokens. Swappable per domain. */
  val abbrevMap: Map[String, String] = MatchingTables.names ++ Map(
    "agg" -> "aggregate",
    "dup" -> "duplicate",
    "col" -> "column",
    "val" -> "value",
    "cust" -> "customer",
    "qty" -> "quantity",
    "j" -> "jean",
    "b" -> "baptiste",
    "p" -> "pierre",
    "m" -> "marie"
  )

  /** Expand every abbreviated token in a space-separated string via a
    * broadcast-sized lookup map, keeping unknown tokens as-is
    * (reference: rgx.py:120 namebuild rebuilds "J.-P." → "jean pierre").
    * The map travels as a literal in the plan — no join, no shuffle. */
  def expandAbbrev(c: Column): Column = {
    val m = typedlit(abbrevMap)
    array_join(transform(split(c, " "), t => coalesce(element_at(m, t), t)), " ")
  }

  /** Plain-Scala normalization mirroring normalizeName, for preparing
    * literal lookup keys at class-init time. */
  private def normalizeKey(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9à-ÿ ]", " ").replaceAll("\\s+", " ").trim

  /** comp_names with keys normalized the way lookup inputs are — the
    * raw table carries keys like "fr emm." that normalizeName output
    * could never equal. */
  private val compNamesNorm: Map[String, String] =
    MatchingTables.compNames.map { case (k, v) => normalizeKey(k) -> v }

  /** Composed-name expansion: a whole-string hit in the reference's
    * comp_names table (matching.py:50) wins — a composed name gives
    * context the per-initial expansion lacks ("j b" → "jean-baptiste",
    * not "jean baptiste") — else fall back to token-wise expandAbbrev. */
  def expandComposed(c: Column): Column =
    coalesce(element_at(typedlit(compNamesNorm), c), expandAbbrev(c))

  /** Status keys in matching order (longest first) — public so the
    * generated oracle iterates the identical literal list. */
  val statusKeys: Seq[String] =
    MatchingTables.status.keys.toSeq.sortBy(k => (-k.length, k))
  /** Regex alternation of every status key — shared with the generated
    * DuckDB oracle so both engines detect titles identically. */
  val statusPattern: String = statusKeys.mkString("|")

  /** True when the name carries a nobility/clerical title
    * (substring scan over MatchingTables.status, itemtoid_prep.py:211 —
    * faithfully substring-based, like the reference's `k in inp`). */
  def hasStatus(c: Column): Column = lower(c).rlike(statusPattern)

  /** The wikidata terms of every translated title present in the name
    * as a WHOLE WORD, space-joined in a deterministic
    * (longest-key-first) order; "" when none. Whole-word matching
    * (unlike the reference's substring scan at itemtoid_prep.py:235)
    * keeps "Duchesse" from also emitting duke via its "duc" substring. */
  def statusTitles(c: Column): Column = {
    val m = typedlit(MatchingTables.status)
    val padded = concat(lit(" "),
      regexp_replace(lower(c), "[^a-zà-ÿ]+", " "), lit(" "))
    trim(array_join(transform(
      filter(typedlit(statusKeys),
        k => contains(padded, concat(lit(" "), k, lit(" "))) && element_at(m, k) =!= ""),
      k => element_at(m, k)), " "))
  }

  /** Particles dropped when reducing a nobility name to its surname. */
  val particles: Seq[String] = Seq("le", "la", "les", "l", "de", "des", "du", "d", "et", "puis", "dit")

  /** Boundary-delimited title alternation. NOT `\b`: Java's \b is
    * Unicode-aware while RE2's (the oracle's) is ASCII-only, so they
    * disagree at accented edges ("abbé "). An explicit letter-class
    * boundary means the same thing in both engines. */
  private val titleSpan = s"(^|[^a-zà-ÿ])($statusPattern)([^a-zà-ÿ]|$$)"

  /** Strip titles + particles from a nobility name, leaving the
    * searchable surname (the regex cascade at itemtoid_prep.py:218-230).
    * Two boundary-delimited title-alternation passes (the second catches
    * a title whose leading boundary the first consumed; the reference's
    * unbounded regex would eat "duc" out of "Ducros" — intentional
    * fix), then a token-level particle filter: token filtering has no
    * adjacent-match blind spot and, unlike a lookahead regex, is
    * RE2-expressible for the DuckDB oracle. */
  def stripStatus(c: Column): Column = {
    val pass1 = regexp_replace(lower(c), titleSpan, "$1 $3")
    val noTitles = regexp_replace(pass1, titleSpan, "$1 $3")
    trim(array_join(filter(split(regexp_replace(noTitles, "[',.]", " "), "\\s+"),
      t => !t.isInCollection(particles) && t =!= ""), " "))
  }

  /** Geography token lists from the reference's tables: departments,
    * provinces, colonies, and country names (matching.py:190-478). */
  val geoTerms: Seq[String] = (MatchingTables.dpts ++ MatchingTables.provinces ++
    MatchingTables.colonies ++ MatchingTables.countries.keys.toSeq).distinct.sorted
  val eventTerms: Seq[String] = MatchingTables.events.keys.toSeq.sorted

  /** The reference's geo/event tokenization (itemtoid_prep.py:73):
    * strip ". ," and dangling hyphens to spaces, keep internal hyphens
    * ("île-de-france" stays one token), split on whitespace. */
  private def geoTokens(c: Column): Column =
    split(regexp_replace(lower(c), "(\\.|,|(\\s-)|(-\\s))+", " "), "\\s+")

  /** Rule-cascade kind classification, mirroring the reference's
    * if/elif chain over name content (itemtoid_prep.py:56-205):
    * documents / charters / geography / events / persons. First match
    * wins — order is semantic. Geography only classifies when no
    * nobility title is present (CASE 4's guard: "Duc de Bretagne" is a
    * person, not a province). */
  def classifyName(c: Column): Column = {
    val toks = geoTokens(c)
    when(c.rlike("(?i)(document|divers)"), lit("document"))
      .when(c.rlike("(?i)charte"), lit("charter"))
      .when(c.rlike("(?i)(table|region|nation)") ||
        (arrays_overlap(toks, typedlit(geoTerms)) && !hasStatus(c)), lit("place"))
      .when(c.rlike("(?i)(stream|event|war|revolution)") ||
        arrays_overlap(toks, typedlit(eventTerms)), lit("event"))
      .otherwise(lit("person"))
  }

  /** Occupation extraction from the trait (itemtoid_prep.py:305-341):
    * each trait token equal to a key of the functions table votes its
    * wikidata occupation; the distinct hits reduce by the reference's
    * priority rules (marshal > general > emperor > first extracted). */
  def occupationExtract(c: Column): Column = {
    val m = typedlit(MatchingTables.functions)
    val toks = split(lower(c), "\\s+")
    val clean = transform(toks, t => regexp_replace(t, "^[^a-zà-ÿ'-]+|[^a-zà-ÿ'-]+$", ""))
    val hits = filter(transform(clean, t => element_at(m, t)), _.isNotNull)
    val d = array_distinct(hits)
    // "first extracted" reads the ordered hit list, never the distinct
    // list — engines need not agree on distinct's output order
    when(size(d) === 0, lit(null).cast("string"))
      .when(array_contains(d, "marshal") &&
        (array_contains(d, "general") || array_contains(d, "military")), lit("marshal"))
      .when(size(d) > 1 && array_contains(d, "general") && array_contains(d, "military"),
        lit("general"))
      .when(size(d) > 1 && array_contains(d, "emperor"), lit("emperor"))
      .otherwise(element_at(hits, 1))
  }

  /** Extract a year appearing after a birth marker ("N." / "né") and
    * after a death marker ("M." / "mort"), as the reference does with
    * context regexes over the trait (itemtoid_prep.py:293-303). */
  def birthYear(c: Column): Column =
    nullif(regexp_extract(c, "(?:^|[\\s,.])[Nn](?:\\.|é|ée)[^0-9]*([0-9]{4})", 1), lit(""))

  def deathYear(c: Column): Column =
    nullif(regexp_extract(c, "(?:^|[\\s,.])[Mm](?:\\.|ort|orte)[^0-9]*([0-9]{4})", 1), lit(""))
}
