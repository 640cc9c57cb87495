package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.expressions._

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get them with no
  * Scala import — `SELECT simhash64(split(text, ' ')) FROM docs`.
  *
  * Activate via `.withExtensions(new GraftExtensions)` (GraftSession
  * does) or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RankFilterToTopK)
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity", "cosine_similarity(a, b) - cosine of two float arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - k-element MinHash signature"),
      (es: Seq[Expression]) => MinHashSig(es(0), intArg(es(1), "k"))))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprint"),
      info("winnow_fingerprint", "winnow_fingerprint(text, k, w) - winnowing fingerprint set"),
      (es: Seq[Expression]) => WinnowFingerprint(es(0), intArg(es(1), "k"), intArg(es(2), "w"))))
    ext.injectFunction((FunctionIdentifier("sorted_jaccard"),
      info("sorted_jaccard", "sorted_jaccard(a, b) - Jaccard of two sorted long arrays"),
      (es: Seq[Expression]) => SortedJaccard(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("hyperplane_lsh"),
      info("hyperplane_lsh", "hyperplane_lsh(vec, table, planes) - random-hyperplane LSH bucket"),
      (es: Seq[Expression]) => HyperplaneLsh(es(0), intArg(es(1), "table"), intArg(es(2), "planes"))))
    ext.injectFunction((FunctionIdentifier("levenshtein_bounded"),
      info("levenshtein_bounded",
        "levenshtein_bounded(a, b, k) - min(levenshtein(a,b), k+1), banded DP with early exit"),
      (es: Seq[Expression]) => BoundedLevenshtein(es(0), es(1), intArg(es(2), "k"))))
    ext.injectFunction((FunctionIdentifier("md5_mod61"),
      info("md5_mod61", "md5_mod61(s) - md5 lower-64 mod 2^61-1 (DuckDB-reproducible hash)"),
      (es: Seq[Expression]) => Md5Mod61(es.head)))
  }
}
