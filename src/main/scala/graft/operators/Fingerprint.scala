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

  /** Eval-set contamination check — the question every training run
    * must answer: which training documents share verbatim substrings
    * with the benchmark set? Winnowing guarantees any shared substring
    * of length ≥ k+w-1 yields a shared fingerprint, so the check is an
    * equi-join on exploded fingerprint values: train side shuffles on
    * the (long) fingerprint, eval side is the small one. Flagging is by
    * the FRACTION of the eval doc's fingerprints found in the train doc
    * — an absolute count only measures vocabulary overlap (on this
    * small-vocabulary corpus nearly every pair shares a few windows);
    * coverage ≥ 0.5 means half the benchmark document appears verbatim.
    * Here every 37th doc stands in for the benchmark set.
    *
    * Fingerprints appearing in more than MaxDocFreq documents are
    * dropped before the join: a window shared by that many docs is
    * boilerplate, not contamination, and it inflates the equi-join
    * quadratically (a 10× corpus probe: 38s → 9s). Coverage is over
    * the eval doc's RARE fingerprints only — the informative ones —
    * so removing boilerplate doesn't dilute the signal (winnowing
    * biases toward globally-minimal hashes, so ubiquitous fps are
    * common at corpus scale) — on the small-vocabulary test corpus
    * this drops boilerplate-driven false positives and keeps the true
    * verbatim-duplication pairs. */
  final val MaxDocFreq = 256

  def contaminationCheck(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), Similarity.winnow(col("text"), k = 8, w = 4).as("fps"))
    val allFps = docs.select(col("doc_id"), explode(col("fps")).as("fp"))
    val rare = allFps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= MaxDocFreq)
      .select(col("fp"))
    val fps = allFps.join(rare, Seq("fp"))
    val eval_ = fps.filter(pmod(col("doc_id"), lit(37)) === 0)
      .select(col("doc_id").as("eval_id"), col("fp"))
    val evalSizes = eval_.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_eval_fps"))
    val train = fps.filter(pmod(col("doc_id"), lit(37)) =!= 0)
      .select(col("doc_id").as("train_id"), col("fp"))
    train.join(eval_, Seq("fp"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared"))
      .join(broadcast(evalSizes), Seq("eval_id"))
      .withColumn("coverage", col("shared").cast("double") / col("n_eval_fps"))
      .filter(col("coverage") >= 0.5)
      .select(col("train_id"), col("eval_id"), col("shared"), col("coverage"))
  }

  /** Exact 13-gram decontamination (the GPT-3 appendix-C recipe): a
    * training document is contaminated if any of its 13-word grams
    * appears verbatim in the held-out eval set. Every train doc comes
    * back with its shared-gram count and keep/drop flag — the
    * actionable per-document decision, where contaminationCheck above
    * reports coverage diagnostics.
    *
    * Scale shape: the eval side of the join is the distinct gram set
    * of the BENCHMARK corpus — tiny by construction (benchmarks are
    * thousands of docs, not billions) — so it broadcasts and the train
    * side never shuffles: explode grams, hash them (cross-engine
    * md5Mod so DuckDB recomputes the same keys), broadcast-join,
    * aggregate per doc on the already-present doc_id. One wide scan,
    * zero exchanges on the 100 TB side except the final per-doc agg,
    * which combines map-side. */
  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 13)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 12), i -> concat_ws(' ', slice(toks, i, 13)))"))
        .as("gram"))
      .select(col("doc_id"), Similarity.md5Mod(col("gram")).as("g"))
    val isEval = pmod(col("doc_id"), lit(37)) === 0
    val evalGrams = grams.filter(isEval).select(col("g")).distinct()
    val hits = grams.filter(!isEval)
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("g")).as("n_shared"))
    Tables.documents(spark, sfDir).filter(!isEval)
      .select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("contaminated", col("n_shared") > 0)
  }
}
