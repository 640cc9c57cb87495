package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed TEI catalogue ingest — the Spark form of the reference's
  * nametable builder (script/utils/nametable.py:19 csvbuilder), which
  * walks CAT_*.xml files with lxml and emits one (xml_id, name, trait)
  * row per person with cardinality rules for mismatched name/trait
  * counts.
  *
  * Spark shape: `wholetext` scan (one row per catalogue file, so files
  * distribute across executors), namespace normalization and item
  * isolation as codegen'd string expressions, per-item field extraction
  * via the built-in xpath expressions, and the name↔trait zip rules as
  * a single `when` cascade producing an exploded struct array. No
  * driver-side DOM; ingest throughput scales with file count.
  */
object TeiCatalog {

  /** One row per catalogue file: (path, xml). */
  def readCatalogues(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .select(input_file_name().as("path"), col("value").as("xml"))

  /** Collapse whitespace exactly like the reference's
    * `re.sub(r"\s+", " ", x.replace("\n", ""))` (plus trim). */
  private def ws(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(c, "\\s+", " "))

  /** Namespace normalization shared by the item isolator and its
    * audit: the Hive xpath engine resolves no namespaces, so xmlns
    * decls and tei: prefixes drop up front (string ops, distributed). */
  private def cleanXml(catalogues: DataFrame): DataFrame =
    catalogues.withColumn("x", regexp_replace(
      regexp_replace(col("xml"), "\\sxmlns(:[A-Za-z0-9]+)?=\"[^\"]*\"", ""),
      "(</?)tei:", "$1"))

  /** The depth-aware item isolator shared by `nametable` and the
    * audit: one linear scan per file slicing every balanced
    * `<item …>…</item>` — nested occurrences included, in document
    * order — the element set lxml's `//tei:item` visits in the
    * reference (nametable.py:47). Struct fields: slices / n_open /
    * n_close (self-closing counts as both). */
  private def itemScan =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.XmlElementScan(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("x")), "item"))

  /** Per-file well-formedness audit over the SAME tokenization the
    * isolator uses: a clean file has open = close = isolated counts.
    * Nested, attribute-less, and self-closing items are all handled by
    * the scanner now, so `clean = false` means genuine corruption — an
    * unclosed item (open > matched) or a stray close tag. Run it on
    * new corpora before trusting `nametable`; TeiCatalogSpec locks the
    * handled-vs-corrupt boundary. */
  def auditItems(catalogues: DataFrame): DataFrame =
    cleanXml(catalogues)
      .select(col("path"), itemScan.as("sc"))
      .select(col("path"),
        col("sc.n_open").as("n_open"),
        col("sc.n_close").as("n_close"),
        size(col("sc.slices")).as("n_isolated"))
      .withColumn("clean",
        col("n_open") === col("n_close") && col("n_open") === col("n_isolated"))

  /** nametable rows from raw catalogue XML (nametable.py cases 1-5):
    *  - no traits        → one row, all names joined by "; "
    *  - 1 trait, n names → first name carries the trait, rest empty
    *  - n traits ≠ n names (n>1) → one row of joined names + traits
    *  - n traits = n names → pairwise zip
    * Item isolation is the depth-aware `itemScan`, so nested items
    * (legal TEI) each yield their own rows in document order, with the
    * outer item's fields drawn only from its DIRECT name/trait
    * children — matching lxml's `//tei:item` + `./tei:name` exactly.
    * The xpath below sees the nested child inside the outer slice at
    * /item/list/item/…, which `/item/name` does not select. */
  def nametable(catalogues: DataFrame): DataFrame = {
    val cleaned = cleanXml(catalogues)
    val items = cleaned
      .select(col("path"),
        posexplode(itemScan.getField("slices")).as(Seq("item_pos", "item")))
      .select(col("path"), col("item_pos"),
        expr("xpath_string(item, \"/item/@*[local-name()='id']\")").as("xml_id"),
        expr("xpath(item, '/item/name/text()')").as("names"),
        expr("xpath(item, '/item/trait//*/text()')").as("traits"))
      .filter(size(col("names")) > 0)

    val nn = size(col("names"))
    val nt = size(col("traits"))
    val joinedNames = ws(array_join(col("names"), "; "))
    val joinedTraits = ws(array_join(col("traits"), "; "))
    val pairs = when(nt === 0,
        array(struct(joinedNames.as("name"), lit("").as("trait"))))
      .when(nt > 1 && nt =!= nn,
        array(struct(joinedNames.as("name"), joinedTraits.as("trait"))))
      .when(nt === 1 && nn =!= 1,
        expr("transform(names, (n, i) -> struct(n as name, if(i = 0, traits[0], '') as trait))"))
      .otherwise(expr("zip_with(names, traits, (n, t) -> struct(n as name, t as trait))"))

    items
      .select(col("path"), col("item_pos"), col("xml_id"),
        posexplode(pairs).as(Seq("pair_pos", "pair")))
      .select(col("path"), col("item_pos"), col("pair_pos"), col("xml_id"),
        lit("").as("wikidata_id"),
        ws(col("pair.name")).as("name"), ws(col("pair.trait")).as("trait"))
  }

  /** "le même" carry-forward (itemtoid_prep.py:14 CASE 1): an item
    * whose name is "le même / la même" inherits the previous item's
    * name within its catalogue. Sequential in the reference; here a
    * fill-forward window — last non-"le même" name over the in-file
    * item order, partitioned by file so catalogues scale out. */
  def resolveLeMeme(nametable: DataFrame): DataFrame = {
    // (item_pos, pair_pos) totally orders rows within a file — a bare
    // item_pos ties on multi-name items and would carry an arbitrary
    // one of them. Prefix match (no $), like the reference's re.match.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("path")).orderBy(col("item_pos"), col("pair_pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val isMeme = col("name").rlike("(?i)^(le|la)\\sm[êe]me")
    nametable
      .withColumn("name",
        coalesce(last(when(!isMeme, col("name")), ignoreNulls = true).over(w), col("name")))
  }
}
