package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed model-training primitives — the full-batch gradient
  * step a data-parallel trainer runs per iteration, expressed as the
  * aggregation it really is: per-feature partial sums on every
  * partition, merged associatively (the AllReduce), one weight update.
  */
object Learn {

  /** Hashed feature buckets (fastText-style feature hashing). */
  final val LrBuckets = 256L
  /** Learning rate 1/128 — a BINARY fraction, so the update is exact
    * in IEEE doubles on both engines. */
  final val LrEtaInv = 128L

  /** One FULL-BATCH logistic-regression gradient step from zero
    * weights on hashed token counts, labels y = (lang = 'en') — the
    * data-parallel training step in its honest distributed form. At
    * w = 0 the sigmoid is EXACTLY 1/2, so the gradient
    * g_j = Σ_docs (σ(w·x) − y)·x_j collapses to (mass_neg −
    * mass_pos)/2 per bucket: every term is an exact long and the two
    * divides (by 2 and by η⁻¹ = 128) are binary-exact — the one GD
    * step that is bit-reproducible with NO float-sum ordering anywhere
    * (later steps need exp() and are where a deployment accepts
    * nondeterminism or fixes partition order; this operator pins the
    * mechanics: hash → per-bucket partial sums → merge → update).
    *
    * Scale shape: ONE map-side-combined shuffle of (bucket, class)
    * partial sums — shuffle volume is 2×LrBuckets cells per partition
    * regardless of corpus size, exactly an AllReduce's payload. */
  def logregGrad(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("j",
        pmod(graft.functions.Similarity.md5Mod(concat(lit("lr-"), col("tok"))),
          lit(LrBuckets)))
      .groupBy(col("j"))
      .agg(sum(col("y")).as("s_pos"), sum(lit(1L) - col("y")).as("s_neg"))
      .select(col("j"), col("s_pos"), col("s_neg"),
        ((col("s_neg") - col("s_pos")).cast("double") / 2.0).as("grad"),
        ((col("s_pos") - col("s_neg")).cast("double") / (2.0 * LrEtaInv))
          .as("w_next"))
  }
}
