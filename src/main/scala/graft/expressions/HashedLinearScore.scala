package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Hashed-bag-of-words linear classifier margin — the fastText /
  * CCNet quality-classifier shape with a deterministic md5-derived
  * weight vector, so the DuckDB oracle recomputes the identical score
  * from `md5_number_lower`:
  *
  *   bucket(t) = md5Mod("qc-" + t) % buckets
  *   weight(b) = md5Mod("qw-" + b) % 2001 - 1000        (in [-1000, 1000])
  *   margin    = Σ_tokens weight(bucket(t))              (exact long)
  *
  * One pass over the token array per row (empty tokens skipped, so a
  * raw `split(text, ' ')` can feed it directly); returns
  * struct<n_tokens: bigint, margin_raw: bigint>. The per-bucket weight
  * table is precomputed once per JVM — per token the kernel pays one
  * md5 and one array read. A real deployment swaps the md5 weights for
  * trained ones (broadcast the weight array); the plan shape — one
  * row-local projection, no explode, no join — is the point. */
case class HashedLinearScore(child: Expression, buckets: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("margin_raw", LongType, nullable = false)))
  override def prettyName: String = "hashed_linear_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    HashedLinearScore.compute(a.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.HashedLinearScore.compute($a, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}

object HashedLinearScore {
  require(CrossHash.P > 0) // force object init order

  private val weightCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  /** weight(b) = md5Mod("qw-" + b) % 2001 - 1000 — computed once per
    * bucket count per JVM. */
  def weights(buckets: Int): Array[Long] =
    weightCache.computeIfAbsent(buckets,
      b => Array.tabulate(b)(i => CrossHash.md5Mod("qw-" + i) % 2001 - 1000))

  def compute(tokens: ArrayData, buckets: Int): InternalRow = {
    val w = weights(buckets)
    val n = tokens.numElements()
    var nTok = 0L
    var margin = 0L
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (t.numBytes() > 0) {
          nTok += 1
          val b = (CrossHash.md5Mod("qc-" + t.toString) % buckets).toInt
          margin += w(b)
        }
      }
      i += 1
    }
    InternalRow(nTok, margin)
  }
}
