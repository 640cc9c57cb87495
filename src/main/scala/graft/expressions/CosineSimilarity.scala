package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity between two float-array embeddings, accumulated in
  * double left-to-right (bit-identical to a sequential oracle).
  *
  * A native expression rather than `aggregate(zip_with(...))` because
  * higher-order functions fall out of whole-stage codegen and box every
  * element — on the ANN path this expression runs O(rows × queries)
  * times, so the tight primitive loop is the difference between a
  * codegen'd scan and an interpreted one.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType).collectFirst {
      case t if !t.isInstanceOf[ArrayType] ||
        t.asInstanceOf[ArrayType].elementType != FloatType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> inputs, got $t (cast double arrays to FLOAT)")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.CosineSimilarity.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
