package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All character (code-point) trigrams of a string, as one array — the
  * hot input of the Cavnar-Trenkle language-ID operator. Semantically
  * `transform(sequence(1, numChars-2), i -> substr(s, i, 3))`, but one
  * O(n) byte pass: UTF8String.substring re-seeks from byte 0 on every
  * call (O(n²) per document) and the split-to-char-array formulation
  * allocates one single-char string per position plus a 3-way concat
  * per trigram. Here code-point starts are indexed once and each
  * trigram is a single fromBytes slice. Code-point (not grapheme)
  * boundaries match both Java's split("") and DuckDB's substr, so the
  * oracle parity is unchanged.
  */
case class CharTrigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    CharTrigrams.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expressions.CharTrigrams.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
    copy(child = newChild)
}

object CharTrigrams {
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(s: UTF8String): ArrayData = {
    val n = s.numChars()
    if (n < 3) return Empty
    val bytes = s.getBytes
    // byte offset of each code-point start, plus the end sentinel
    val offs = new Array[Int](n + 1)
    var i = 0
    var b = 0
    while (i < n) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(n) = bytes.length
    val out = new Array[Any](n - 2)
    var k = 0
    while (k < n - 2) {
      out(k) = UTF8String.fromBytes(bytes, offs(k), offs(k + 3) - offs(k))
      k += 1
    }
    new GenericArrayData(out)
  }
}
