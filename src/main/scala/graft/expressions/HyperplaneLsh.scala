package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket (Charikar 2002): the sign pattern of an
  * embedding's dot products with `numPlanes` fixed pseudo-random
  * hyperplanes, packed into an int. Vectors with cosine similarity
  * cos(θ) collide with probability (1 - θ/π)^numPlanes, so an equi-join
  * on the bucket replaces the all-pairs similarity scan; `table` seeds
  * an independent plane set, and unioning candidates over L tables
  * recovers the recall a single bucketing loses.
  *
  * Planes are Rademacher (±1) vectors with signs from md5 parity, and
  * the embedding is quantized to floor(x·2^20) longs before the dot
  * product — an EXACT integer computation both engines reproduce
  * bit-for-bit (float→double is exact, ·2^20 shifts the exponent,
  * floor is exact), so no float-summation-order ambiguity can flip a
  * near-zero sign. Oracle form per component:
  *   sign = md5_number_lower('hp-' || t || '-' || p || '-' || d) % 2.
  * Every executor materializes identical planes with no broadcast and
  * no stored model.
  */
case class HyperplaneLsh(child: Expression, table: Int, numPlanes: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_lsh"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
      child.dataType.asInstanceOf[ArrayType].elementType != FloatType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> input, got ${child.dataType}")
    else if (table < 0 || table >= HyperplaneLsh.MaxTables)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName table must be in [0, ${HyperplaneLsh.MaxTables}), got $table")
    else if (numPlanes <= 0 || numPlanes > HyperplaneLsh.MaxPlanes)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName planes must be in [1, ${HyperplaneLsh.MaxPlanes}], got $numPlanes")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    HyperplaneLsh.compute(input.asInstanceOf[ArrayData], table, numPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HyperplaneLsh.compute($c, $table, $numPlanes)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLsh =
    copy(child = newChild)
}

object HyperplaneLsh {
  final val MaxTables = 4
  final val MaxPlanes = 16
  final val MaxDims = 64
  /** Quantization factor 2^20: float32 has 24 mantissa bits, so
    * floor(x·2^20) keeps sub-ulp resolution for |x| ≲ 16 while the
    * 64-dim dot stays far inside long range. */
  final val Quant = 1048576.0

  // Rademacher plane signs from md5 parity — the oracle regenerates
  // them inline; direction-only use, so ±1 entries suffice (they lose
  // nothing vs gaussian planes for sign-projection LSH).
  private val signs: Array[Array[Array[Long]]] =
    Array.tabulate(MaxTables, MaxPlanes, MaxDims) { (t, p, d) =>
      if (java.lang.Long.remainderUnsigned(
        CrossHash.md5Lower64(s"hp-$t-$p-$d"), 2L) == 0L) 1L else -1L
    }

  def compute(a: ArrayData, table: Int, numPlanes: Int): Int = {
    val n = math.min(a.numElements(), MaxDims)
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = math.floor(a.getFloat(i).toDouble * Quant).toLong
      i += 1
    }
    val tSigns = signs(table)
    var bits = 0
    var p = 0
    while (p < numPlanes) {
      val plane = tSigns(p)
      var dot = 0L
      var j = 0
      while (j < n) {
        dot += plane(j) * q(j)
        j += 1
      }
      if (dot > 0) bits |= (1 << p)
      p += 1
    }
    bits
  }
}
