package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005) —
  * frequency estimation under FIXED memory, the sketch a streaming /
  * multi-tenant pipeline keeps when the exact vocabulary no longer
  * fits. Depth hash rows x Width counters; est(t) = min over rows of
  * the counter t hashes into; the estimate never undershoots and
  * overshoots by collision mass only.
  *
  * Build order is vocabulary-first: the corpus collapses to per-term
  * counts in one map-side-combined shuffle (needed anyway for the
  * exact audit column), and the sketch aggregates the VOCABULARY — a
  * Depth-row fan-out of the distinct-term table into Depth*Width cells,
  * never a second pass over the corpus. The cell table (2048 rows, a
  * few KB regardless of input scale — that is the point of the sketch)
  * broadcasts onto the candidate top-k, which arrives through the
  * bounded-heap TopK operator's no-grouping path. Output audits the
  * sketch: exact count, CMS estimate, and the (always >= 0)
  * overestimate per heavy hitter.
  *
  * Hash family is md5-derived ('cms{d}-' || term, mod 2^61-1, mod
  * Width) so the DuckDB oracle replays identical cell placement and
  * the gate checks estimated VALUES, not just shape.
  */
object Sketch {

  /** Independent hash rows. */
  final val Depth = 4
  /** Counters per row. */
  final val Width = 512
  /** Heavy hitters reported. */
  final val TopN = 20

  private def bucket(term: Column, d: Column): Column =
    pmod(graft.functions.Similarity.md5Mod(
      concat(lit("cms"), d.cast("string"), lit("-"), term)), lit(Width.toLong))

  def cmsTopk(spark: SparkSession, sfDir: String): DataFrame = {
    // both consumers (cells, cands) share this exact subtree, so the
    // corpus-token shuffle is built once and ReusedExchange feeds the
    // second branch — no persist needed
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))

    val cells = vocab
      .select(col("token"), col("cnt"),
        explode(sequence(lit(0), lit(Depth - 1))).as("d"))
      .withColumn("bucket", bucket(col("token"), col("d")))
      .groupBy(col("d"), col("bucket")).agg(sum(col("cnt")).as("cell"))

    val cands = vocab.transform(graft.plans.TopK.perGroup(
      Seq(), Seq("cnt" -> false, "token" -> true), TopN))

    cands
      .select(col("token"), col("cnt"),
        explode(sequence(lit(0), lit(Depth - 1))).as("d"))
      .withColumn("bucket", bucket(col("token"), col("d")))
      .join(broadcast(cells), Seq("d", "bucket"))
      .groupBy(col("token"), col("cnt"))
      .agg(min(col("cell")).as("cms_est"))
      .select(col("token"), col("cnt").as("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("cnt")).as("over_est"))
  }
}
