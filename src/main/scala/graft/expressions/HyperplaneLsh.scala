package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
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
  * Planes are derived deterministically from xxhash64, so every
  * executor materializes identical planes with no broadcast and no
  * stored model.
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

  // uniform in [-0.5, 0.5); direction-only use, so the distribution
  // shape is irrelevant beyond symmetry
  private val planes: Array[Array[Array[Double]]] =
    Array.tabulate(MaxTables, MaxPlanes, MaxDims) { (t, p, d) =>
      java.lang.Math.floorMod(
        XXH64.hashLong((t.toLong * MaxPlanes + p) * MaxDims + d, 7L), 1000003L)
        .toDouble / 1000003.0 - 0.5
    }

  def compute(a: ArrayData, table: Int, numPlanes: Int): Int = {
    val n = math.min(a.numElements(), MaxDims)
    val tPlanes = planes(table)
    var bits = 0
    var p = 0
    while (p < numPlanes) {
      val plane = tPlanes(p)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += a.getFloat(i).toDouble * plane(i)
        i += 1
      }
      if (dot > 0) bits |= (1 << p)
      p += 1
    }
    bits
  }
}
