package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Similarity
import graft.sources.Tables

/** Winnowing document fingerprints: per doc, the sorted distinct set of
  * rolling-hash minima (k=8 byte grams, window w=4). Shared fingerprints
  * between docs certify a shared ≥11-byte substring — the
  * plagiarism/contamination-detection primitive.
  */
object Fingerprint {
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        Similarity.winnow(col("text"), k = 8, w = 4).as("fingerprints"))
      .withColumn("n_fingerprints", size(col("fingerprints")).cast("long"))
}
