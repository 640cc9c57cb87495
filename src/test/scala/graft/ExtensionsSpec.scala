package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native expressions are reachable from plain SQL via
  * GraftExtensions function registration. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("simhash64 and hamming work from SQL") {
    val r = spark.sql(
      "SELECT bit_count(simhash64(array('a','b','c')) ^ simhash64(array('a','b','x'))) AS h").head()
    assert(r.getAs[Int]("h") >= 0 && r.getAs[Int]("h") <= 64)
  }

  test("cosine_similarity from SQL is 1 for identical vectors") {
    val r = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c").head()
    assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
  }

  test("type mismatches fail at analysis, not silently at runtime") {
    // double arrays would silently read half of each 8-byte slot
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_similarity(array(1.0, 2.0), array(1.0, 2.0))").collect()
    }
    assert(e1.getMessage.contains("array<float>"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hyperplane_lsh(array(CAST(1.0 AS FLOAT)), 99, 8)").collect()
    }
    assert(e2.getMessage.contains("table"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(array(1, 2, 3))").collect()
    }
    assert(e3.getMessage.contains("array<string>"))
  }

  test("minhash_sig, winnow_fingerprint, sorted_jaccard, hyperplane_lsh resolve") {
    val r = spark.sql(
      """SELECT size(minhash_sig(array('x y z'), 16)) AS k,
        |  size(winnow_fingerprint('abcdefghijklmnop', 8, 4)) AS f,
        |  sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  hyperplane_lsh(array(CAST(0.5 AS FLOAT)), 0, 8) AS b""".stripMargin).head()
    assert(r.getAs[Int]("k") == 16)
    assert(r.getAs[Int]("f") > 0)
    assert(r.getAs[Double]("j") == 0.5)
    assert(r.getAs[Int]("b") >= 0 && r.getAs[Int]("b") < 256)
  }

  test("md5_mod61 resolves and matches the DuckDB reference value") {
    // duckdb: SELECT md5_number_lower('abc') % 2305843009213693951
    val v = spark.sql("SELECT md5_mod61('abc') AS h").head().getAs[Long]("h")
    assert(v == java.lang.Long.remainderUnsigned(8250560606382298838L, (1L << 61) - 1))
  }

  test("sinks round-trip: TSV and JSON-lines preserve rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sinks")
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5)).toDF("id", "name", "score")
    graft.sources.Sinks.writeTsv(df, s"$dir/tsv")
    graft.sources.Sinks.writeEntityJson(df, s"$dir/json")
    val tsv = spark.read.option("sep", "\t").option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/tsv")
    val json = spark.read.json(s"$dir/json")
    assert(tsv.collect().map(_.mkString("|")).toSet == df.collect().map(_.mkString("|")).toSet)
    assert(json.select("id", "name", "score").collect().map(_.mkString("|")).toSet ==
      df.collect().map(_.mkString("|")).toSet)
  }

  test("enrichment doc sink round-trips the per-ID nested attribute shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft_enrichdoc")
    val wide = graft.operators.EnrichJoin.enrichWide(spark, sf)
    graft.sources.Sinks.writeEnrichmentDoc(wide, "c_custkey", s"$dir/doc")
    val back = spark.read.json(s"$dir/doc")
    assert(back.count() == wide.count())
    // every non-id column surfaces as attributes.<name>: array<string>
    val attrFields = back.schema("attributes").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(attrFields.fieldNames.toSet == wide.columns.toSet - "c_custkey")
    attrFields.fields.foreach { f =>
      assert(f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
        s"${f.name} must be a value LIST (result_tojson shape)")
    }
    // spot-check one entity: scalar wraps to one-element list, array
    // columns carry their values, and the id round-trips as the key
    val row = wide.orderBy("c_custkey").head()
    val doc = back.filter(back("id") === row.getAs[Long]("c_custkey").toString).head()
    val attrs = doc.getAs[org.apache.spark.sql.Row]("attributes")
    assert(attrs.getAs[scala.collection.Seq[String]]("nation_label").toSeq ==
      Seq(row.getAs[String]("nation_label")))
    assert(attrs.getAs[scala.collection.Seq[String]]("statuses").toSeq ==
      row.getAs[scala.collection.Seq[String]]("statuses").toSeq)
    assert(attrs.getAs[scala.collection.Seq[String]]("workcount").toSeq ==
      Seq(row.getAs[Long]("workcount").toString))
  }
}
