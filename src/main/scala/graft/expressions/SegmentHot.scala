package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bracket-refinement kernel for the distributed exact-quantile
  * pipeline (operators/ExactQuantile.scala): given a value and a
  * probe's bracket boundary arrays `los`/`his` (each m doubles, ±∞
  * sentinels for clamped probes), returns the segment id and the
  * hot flag packed into one long — `(#(boundaries ≤ v) << 1) | hot`,
  * where hot = ∃j: los(j) ≤ v ≤ his(j).
  *
  * A native expression rather than 2m per-boundary `when` chains
  * because the chain's generated code grows linearly with m·k (k =
  * profiled columns): past ~30 boundary references in one projection
  * the stage's generated method outgrows the JVM limit and the whole
  * stage silently falls back to interpreted evaluation — measured at
  * sf10 (60M rows × 3 columns) the identical census costs 8.8s at
  * m=5 and 98s at m=6. One tight primitive loop per column keeps the
  * projection's expression tree m-independent, so the histogram's
  * m=9 octile pass plans the same code as a 3-probe quartile pass.
  * Null boundary elements (a column with zero non-null rows yields
  * null GK output) are skipped: they count into no segment and arm
  * no bracket, matching the when-chain's null semantics.
  *
  * NaN values count into the TOP segment (above every non-null
  * boundary, hot for no bracket) — Spark's sort order places NaN
  * above +∞, so a NaN row must sit above every boundary or it would
  * shift every downstream segment's prefix offset and silently
  * corrupt probed ranks. With NaN pinned to the top, a NaN can only
  * disturb a probe whose rank actually reaches into the NaN region,
  * and there the refinement finds no hot value and the caller's
  * raise_error backstop fires instead of returning a wrong quantile.
  * The two boundary arrays MUST have equal length (a probe owns one
  * lo and one hi); unequal lengths throw rather than truncate. */
case class SegmentHot(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "segment_hot"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double value, got ${first.dataType}")
    else Seq(second, third).map(_.dataType).collectFirst {
      case t if !t.isInstanceOf[ArrayType] ||
        t.asInstanceOf[ArrayType].elementType != DoubleType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double> boundaries, got $t")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def nullSafeEval(v: Any, los: Any, his: Any): Any =
    SegmentHot.compute(v.asInstanceOf[Double],
      los.asInstanceOf[ArrayData], his.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (v, los, his) =>
      s"graft.expressions.SegmentHot.compute($v, $los, $his)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SegmentHot =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SegmentHot {
  def compute(v: Double, los: ArrayData, his: ArrayData): Long = {
    val m = los.numElements()
    if (his.numElements() != m)
      throw new IllegalArgumentException(
        s"segment_hot boundary arrays differ in length: $m vs ${his.numElements()}")
    var seg = 0L
    var hot = false
    var j = 0
    if (java.lang.Double.isNaN(v)) {
      // NaN sorts above +∞ in Spark: top segment, hot for nothing
      while (j < m) {
        if (!los.isNullAt(j)) seg += 1L
        if (!his.isNullAt(j)) seg += 1L
        j += 1
      }
      return seg << 1
    }
    while (j < m) {
      var inLo = false
      if (!los.isNullAt(j)) {
        val b = los.getDouble(j)
        if (v >= b) { seg += 1L; inLo = true }
      }
      if (!his.isNullAt(j)) {
        val b = his.getDouble(j)
        if (v >= b) seg += 1L
        if (inLo && v <= b) hot = true // los(j) ≤ v ≤ his(j)
      }
      j += 1
    }
    (seg << 1) | (if (hot) 1L else 0L)
  }
}
