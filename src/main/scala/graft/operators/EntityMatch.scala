package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Entity resolution — the Spark re-expression of the reference's
  * Wikidata full-text-search cascade (script/itemtoid.py:222
  * launch_query / relaunch_query): for each source record, find the
  * best-matching record in an entity catalog and score how certain
  * the match is (script/itemtoid.py:91-113 request()'s paramcount).
  *
  * Spark-first shape: the remote API lookup becomes a **blocked fuzzy
  * join** — candidates are generated inside an equi-join on a blocking
  * key (here nationkey; first-token/soundex for free text), scored
  * with an edit distance, and reduced to the best match per source row
  * by a pack-and-min argmin aggregate. The blocking key bounds the
  * pair count, so the operator scales linearly in input size instead
  * of quadratically; skewed blocks split under AQE.
  */
object EntityMatch {

  /** Candidate pairs: customer × supplier within a nation block,
    * scored by levenshtein over normalized names. */
  private def scoredPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
      // the probe side arrives as a single row group at test scale —
      // without this the whole scoring stage runs as ONE task; at
      // cluster scale the scan is already many partitions and this
      // round-robin is a cheap no-op relative to the scoring
      .transform(Partitioning.spread)
    val supp = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    // supplier is SF-proportional: no hint, AQE broadcasts when small
    cust.join(supp, col("c_nationkey") === col("s_nationkey"))
      .withColumn("distance", levenshtein(col("c_name"), col("s_name")))
  }

  /** (distance, suppkey) packed into one long: distance in the high
    * bits, key in the low 48. min(packed) IS argmin with the
    * (distance, suppkey) tiebreak — and unlike min_by over a struct
    * (which degrades to SortAggregate with per-row struct allocation),
    * a long min runs in codegen'd HashAggregate with full map-side
    * combine: one row per (partition, customer) reaches the shuffle. */
  private val KeyMask = (1L << 48) - 1
  private def packed: Column =
    (col("distance").cast("long") * lit(1L << 48)) + col("s_suppkey")
  private def unpackKey(p: Column): Column = p.bitwiseAND(lit(KeyMask))

  private def bestPacked(spark: SparkSession, sfDir: String): DataFrame =
    scoredPairs(spark, sfDir)
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .agg(min(packed).as("p"))
      .withColumn("match_id", unpackKey(col("p")))
      .withColumn("distance", shiftright(col("p"), 48).cast("long"))

  /** Best match per customer (argmin distance, suppkey tiebreak). */
  def entityMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val supp = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("match_id"), col("s_name").as("match_name"))
    bestPacked(spark, sfDir)
      .join(supp, Seq("match_id"))
      .select(col("c_custkey"), col("c_name"), col("match_id"),
        col("match_name"), col("distance"))
  }

  /** Certitude scoring: count matched "parameters" exactly like the
    * reference counts query parameters present in a successful search
    * (itemtoid.py:91-113), then threshold. */
  def matchCertitude(spark: SparkSession, sfDir: String): DataFrame = {
    entityMatchWithBal(spark, sfDir)
      .withColumn("param_name", (col("distance") <= 12).cast("int"))
      .withColumn("param_bal", (abs(col("c_acctbal") - col("s_acctbal")) < lit(2000.0)).cast("int"))
      .withColumn("param_key", (pmod(col("c_custkey"), lit(10)) === pmod(col("match_id"), lit(10))).cast("int"))
      .withColumn("paramcount", col("param_name") + col("param_bal") + col("param_key"))
      .withColumn("certitude", (col("paramcount") >= 2))
      .select(col("c_custkey"), col("match_id"), col("paramcount"), col("certitude"))
  }

  /** entityMatch keeping the balance columns needed by certitude. */
  private def entityMatchWithBal(spark: SparkSession, sfDir: String): DataFrame = {
    val supp = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("match_id"), col("s_acctbal"))
    bestPacked(spark, sfDir)
      .join(supp, Seq("match_id"))
      .select(col("c_custkey"), col("c_acctbal"), col("match_id"),
        col("s_acctbal"), col("distance"))
  }

  /** Retry cascade — the reference relaunches its search with fewer
    * parameters when the strict query returns nothing (itemtoid.py:307
    * relaunch_query), degrading certitude per fallback. Spark form:
    * pass 1 is a cheap equi-join on a strict key (here the numeric name
    * tail + nation; certitude 2); only the unmatched remainder pays for
    * pass 2's fuzzy scoring (certitude 1); rows with no candidate at
    * all surface with certitude 0. The anti-join between passes keeps
    * each pass's input shrinking — the distributed shape of a
    * try-cheapest-first lookup cascade. */
  def entityCascade(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val supp = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))

    val exact = cust.join(supp,
        col("c_nationkey") === col("s_nationkey") &&
          substring(col("c_name"), -5, 5) === substring(col("s_name"), -5, 5))
      .groupBy(col("c_custkey"))
      .agg(min(col("s_suppkey")).as("match_id"))
      .withColumn("method", lit("exact"))
      .withColumn("certitude", lit(2))

    val rest = cust.join(exact.select(col("c_custkey")), Seq("c_custkey"), "left_anti")
      .transform(Partitioning.spread)
    val fuzzy = rest.join(supp, col("c_nationkey") === col("s_nationkey"))
      .withColumn("distance", levenshtein(col("c_name"), col("s_name")))
      .groupBy(col("c_custkey"))
      .agg(min(packed).as("p"))
      .select(col("c_custkey"),
        unpackKey(col("p")).as("match_id"),
        lit("fuzzy").as("method"), lit(1).as("certitude"))

    val matched = exact.select(col("c_custkey"), col("match_id"), col("method"), col("certitude"))
      .unionByName(fuzzy)
    cust.select(col("c_custkey"))
      .join(matched, Seq("c_custkey"), "left")
      .select(col("c_custkey"),
        col("match_id"),
        coalesce(col("method"), lit("none")).as("method"),
        coalesce(col("certitude"), lit(0)).as("certitude"))
  }

  /** Deduplicated set of matched entity ids — the reference's
    * idset.py:11 build_idset, which feeds the enrichment stage. */
  def idDedup(spark: SparkSession, sfDir: String): DataFrame =
    bestPacked(spark, sfDir)
      .select(col("match_id"))
      .distinct()
}
