package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Jaccard similarity of two sorted-distinct long arrays via a
  * two-pointer merge — O(n+m) with zero allocation, vs the hash-set
  * `array_intersect` builds per row. This runs once per candidate pair
  * in the dedup operators, so allocation-free matters: it keeps the
  * pair-verification stage inside whole-stage codegen at full speed.
  *
  * Inputs MUST be sorted and duplicate-free (`array_sort` over hashed
  * distinct shingles); the operators own that invariant.
  */
case class SortedJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType).collectFirst {
      case t if !t.isInstanceOf[ArrayType] ||
        t.asInstanceOf[ArrayType].elementType != LongType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> inputs, got $t")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedJaccard.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.SortedJaccard.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 && m == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }
}
