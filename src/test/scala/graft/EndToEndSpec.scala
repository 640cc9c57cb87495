package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.WikidataPipeline
import graft.sources.{Sinks, TeiCatalog}

/** The full reference-user journey (main.py's four stages end to end):
  * catalogue XML files in → nametable TSV, matched-entity table,
  * enriched JSON store, and rewritten XML out — all through the public
  * API and sinks, nothing hand-wired. */
class EndToEndSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val catDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_e2e")
    java.nio.file.Files.writeString(d.resolve("CAT_A.xml"),
      """<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body><list>
        |<item xml:id="A_e1"><name>hugo (victor)</name>
        | <trait><p>N. 1802 M. 1885. Poète.</p></trait></item>
        |<item xml:id="A_e2"><name>le même</name>
        | <trait><p>Autre mention.</p></trait></item>
        |<item xml:id="A_e3"><name>sand (george)</name>
        | <trait><p>N. 1804 M. 1876. Romancière.</p></trait></item>
        |</list></body></text></TEI>""".stripMargin)
    d.toString
  }

  private lazy val outDir: String =
    java.nio.file.Files.createTempDirectory("graft_e2e_out").toString

  private lazy val catalog = Seq(
    ("Q535", "hugo victor"), ("Q7560", "sand george")).toDF("entity_id", "entity_name")

  test("all four pipeline stages produce consistent artifacts") {
    val cats = TeiCatalog.readCatalogues(spark, catDir)
    val nametable = TeiCatalog.resolveLeMeme(TeiCatalog.nametable(cats))
    val matched = WikidataPipeline.itemToId(spark, catDir, catalog)
    val attrs = Seq(("Q535", "poet"), ("Q7560", "novelist")).toDF("wikidata_id", "occupation")
    val enriched = WikidataPipeline.enrich(matched, attrs)
    val rewritten = WikidataPipeline.refInjectXml(cats, matched)

    // stage 1: the nametable resolves 'le même' to the prior name
    val names = nametable.orderBy("item_pos").select("xml_id", "name")
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(names.toMap.apply("A_e2") == "hugo (victor)")

    // stage 2: both real names matched with ids, years extracted
    val m = matched.collect().map(r =>
      r.getAs[String]("name") -> r.getAs[String]("wikidata_id")).toMap
    assert(m("hugo (victor)") == "Q535")
    assert(m("sand (george)") == "Q7560")

    // stage 3: enrichment carries attributes per unique id
    val occ = enriched.collect().map(r =>
      r.getAs[String]("wikidata_id") -> r.getAs[String]("occupation")).toMap
    assert(occ == Map("Q535" -> "poet", "Q7560" -> "novelist"))

    // stage 4: the rewritten XML has refs on matched names, and only there
    val xml = rewritten.head().getAs[String]("xml_ref")
    assert(xml.contains("""<name ref="wd:Q535">hugo (victor)</name>"""))
    assert(xml.contains("""<name ref="wd:Q7560">sand (george)</name>"""))
    assert(!xml.contains("""ref="wd:">"""))

    // sinks: every artifact lands on disk and reads back
    Sinks.writeTsv(nametable.drop("item_pos"), s"$outDir/nametable")
    Sinks.writeEntityJson(enriched, s"$outDir/entities")
    Sinks.writeText(rewritten, "xml_ref", s"$outDir/xml")
    // the reference's per-ID nested attribute document (sparql.py:381)
    Sinks.writeEnrichmentDoc(enriched, "wikidata_id", s"$outDir/enrich_doc")
    assert(spark.read.option("sep", "\t").option("header", "true")
      .csv(s"$outDir/nametable").count() == 3)
    assert(spark.read.json(s"$outDir/entities").count() == 2)
    assert(spark.read.text(s"$outDir/xml").count() >= 1)
    val doc = spark.read.json(s"$outDir/enrich_doc")
    assert(doc.count() == 2)
    assert(doc.filter(col("id") === "Q535")
      .select("attributes.occupation").head()
      .getAs[scala.collection.Seq[String]](0).toSeq == Seq("poet"))
  }
}
