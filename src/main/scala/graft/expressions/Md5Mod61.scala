package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cross-engine string hash: lower 64 bits of md5 reduced mod 2^61-1
  * (CrossHash). The oracle form is `md5_number_lower(s) % P`, so any
  * operator keyed on these values (prefix-filtered jaccard joins,
  * shingle sets) is value-level verifiable in DuckDB. */
case class Md5Mod61(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_mod61"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    Md5Mod61.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Mod61.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Mod61 =
    copy(child = newChild)
}

object Md5Mod61 {
  def compute(s: UTF8String): Long = {
    val b = s.getBytes
    CrossHash.md5Mod(b, 0, b.length)
  }
}
