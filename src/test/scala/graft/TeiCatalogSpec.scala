package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Sinks, TeiCatalog}

/** File-based TEI ingest: every nametable cardinality rule
  * (nametable.py cases 1-5) against fixture catalogues. */
class TeiCatalogSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_tei")
    val cat1 =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<TEI xmlns="http://www.tei-c.org/ns/1.0">
        | <text><body><list>
        |  <item xml:id="CAT_1_e1"><name>Hugo   (Victor)</name>
        |   <trait><p>N. 1802  M. 1885. Poète.</p></trait></item>
        |  <item xml:id="CAT_1_e2"><name>Sand (George)</name></item>
        |  <item xml:id="CAT_1_e3"><name>Dumas</name><name>Dumas fils</name>
        |   <trait><p>Romancier.</p></trait></item>
        | </list></body></text>
        |</TEI>""".stripMargin
    val cat2 =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<tei:TEI xmlns:tei="http://www.tei-c.org/ns/1.0">
        | <tei:text><tei:body><tei:list>
        |  <tei:item xml:id="CAT_2_e1"><tei:name>Verne</tei:name><tei:name>Wells</tei:name>
        |   <tei:trait><tei:p>Romancier.</tei:p></tei:trait>
        |   <tei:trait><tei:p>Essayiste.</tei:p></tei:trait></tei:item>
        |  <tei:item xml:id="CAT_2_e2"><tei:name>Balzac</tei:name><tei:name>Zola</tei:name>
        |   <tei:trait><tei:p>A.</tei:p></tei:trait><tei:trait><tei:p>B.</tei:p></tei:trait>
        |   <tei:trait><tei:p>C.</tei:p></tei:trait></tei:item>
        | </tei:list></tei:body></tei:text>
        |</tei:TEI>""".stripMargin
    java.nio.file.Files.writeString(d.resolve("CAT_1.xml"), cat1)
    java.nio.file.Files.writeString(d.resolve("CAT_2.xml"), cat2)
    d.toString
  }

  private lazy val rows: Map[(String, String), String] =
    TeiCatalog.nametable(TeiCatalog.readCatalogues(spark, dir))
      .collect()
      .map(r => (r.getAs[String]("xml_id"), r.getAs[String]("name")) -> r.getAs[String]("trait"))
      .toMap

  test("1 name + 1 trait zips pairwise with whitespace collapsed") {
    assert(rows(("CAT_1_e1", "Hugo (Victor)")) == "N. 1802 M. 1885. Poète.")
  }

  test("no trait yields an empty trait") {
    assert(rows(("CAT_1_e2", "Sand (George)")) == "")
  }

  test("1 trait + n names attaches the trait to the first name only") {
    assert(rows(("CAT_1_e3", "Dumas")) == "Romancier.")
    assert(rows(("CAT_1_e3", "Dumas fils")) == "")
  }

  test("equal names and traits zip pairwise (prefixed TEI markup)") {
    assert(rows(("CAT_2_e1", "Verne")) == "Romancier.")
    assert(rows(("CAT_2_e1", "Wells")) == "Essayiste.")
  }

  test("mismatched counts collapse to joined lists") {
    assert(rows(("CAT_2_e2", "Balzac; Zola")) == "A.; B.; C.")
  }

  test("le même inherits the previous item's name in file order") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val nt = Seq(
      ("f1", 0, 0, "i1", "", "Hugo (Victor)", "t1"),
      ("f1", 0, 1, "i1b", "", "Dumas", "t1b"), // multi-name item: last pair carries
      ("f1", 1, 0, "i2", "", "Le même", "t2"),
      ("f1", 2, 0, "i3", "", "Sand (George)", "t3"),
      ("f1", 3, 0, "i4", "", "la même.", "t4"),
      ("f2", 0, 0, "i5", "", "le même", "t5")) // no predecessor → kept as-is
      .toDF("path", "item_pos", "pair_pos", "xml_id", "wikidata_id", "name", "trait")
    val filled = TeiCatalog.resolveLeMeme(nt)
      .collect().map(r => r.getAs[String]("xml_id") -> r.getAs[String]("name")).toMap
    assert(filled("i2") == "Dumas") // the item's LAST pair is the previous row
    assert(filled("i4") == "Sand (George)")
    assert(filled("i5") == "le même")
  }

  test("nested tei:item parses with DOM semantics (lxml //item + ./name)") {
    // legal nested items: the reference's //tei:body//tei:item visits
    // BOTH, in document order, and ./tei:name on the outer item takes
    // only its direct-child name — never the nested item's
    val d = java.nio.file.Files.createTempDirectory("graft_tei_nested")
    java.nio.file.Files.writeString(d.resolve("CAT_9.xml"),
      """<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body><list>
        |<item xml:id="CAT_9_e1"><name>Outer</name>
        | <trait><p>Outer trait.</p></trait>
        | <list><item xml:id="CAT_9_e2"><name>Inner</name>
        |  <trait><p>Inner trait.</p></trait></item></list>
        |</item>
        |</list></body></text></TEI>""".stripMargin)
    val got = TeiCatalog.nametable(TeiCatalog.readCatalogues(spark, d.toString))
      .orderBy(org.apache.spark.sql.functions.col("item_pos"))
      .collect().map(r => (r.getAs[String]("xml_id"), r.getAs[String]("name"),
        r.getAs[String]("trait")))
    assert(got.toSeq == Seq(
      ("CAT_9_e1", "Outer", "Outer trait."),
      ("CAT_9_e2", "Inner", "Inner trait.")))
    // and the audit reports the nested file clean — nesting is handled,
    // not a precondition violation
    val audit = TeiCatalog.auditItems(TeiCatalog.readCatalogues(spark, d.toString))
      .collect().head
    assert(audit.getAs[Boolean]("clean"))
    assert(audit.getAs[Int]("n_isolated") == 2)
  }

  test("auditItems is clean on handled shapes, flags genuine corruption") {
    import org.apache.spark.sql.functions.col
    // the real-shape fixtures are clean: open = close = isolated
    val clean = TeiCatalog.auditItems(TeiCatalog.readCatalogues(spark, dir))
    assert(clean.filter(!col("clean")).count() == 0)

    // attribute-less and self-closing items are handled by the scanner
    // (slice emitted; nameless items drop in nametable) — clean; an
    // unclosed item and a stray close tag are corruption — flagged
    val d = java.nio.file.Files.createTempDirectory("graft_tei_bad")
    java.nio.file.Files.writeString(d.resolve("CAT_10.xml"),
      """<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body><list>
        |<item><name>NoAttrs</name></item>
        |</list></body></text></TEI>""".stripMargin)
    java.nio.file.Files.writeString(d.resolve("CAT_11.xml"),
      """<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body><list>
        |<item/>
        |</list></body></text></TEI>""".stripMargin)
    java.nio.file.Files.writeString(d.resolve("CAT_12.xml"),
      """<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body><list>
        |<item xml:id="CAT_12_e1"><name>Unclosed</name>
        |</list></body></text></TEI>""".stripMargin)
    java.nio.file.Files.writeString(d.resolve("CAT_13.xml"),
      """<TEI xmlns="http://www.tei-c.org/ns/1.0"><text><body><list>
        |<item xml:id="CAT_13_e1"><name>Ok</name></item></item>
        |</list></body></text></TEI>""".stripMargin)
    val audit = TeiCatalog.auditItems(TeiCatalog.readCatalogues(spark, d.toString))
      .collect().map(r => r.getAs[String]("path").split("/").last ->
        r.getAs[Boolean]("clean")).toMap
    assert(audit("CAT_10.xml") == true, "attribute-less items are handled")
    assert(audit("CAT_11.xml") == true, "self-closing items are handled")
    assert(audit("CAT_12.xml") == false, "an unclosed item must be flagged")
    assert(audit("CAT_13.xml") == false, "a stray close tag must be flagged")
  }

  test("nametable TSV sink round-trips") {
    val out = java.nio.file.Files.createTempDirectory("graft_tsv").toString
    val nt = TeiCatalog.nametable(TeiCatalog.readCatalogues(spark, dir))
    Sinks.writeTsv(nt, out)
    val back = spark.read.option("sep", "\t").option("header", "true").csv(out)
    assert(back.count() == nt.count())
    assert(back.columns.toSeq == nt.columns.toSeq)
  }
}
