package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature of a shingle set: k permutations approximated by k
  * seeded xxhash64 passes, signature element i = min hash under seed i
  * (Broder's min-wise independent permutations). Jaccard(A,B) ≈
  * fraction of equal signature positions; LSH banding over the
  * signature yields near-dup candidates without the O(n²) cross join.
  *
  * Native expression: one pass over the shingle bytes per seed, no
  * boxing, static-call codegen — the interpreted higher-order
  * equivalent (transform over seeds × array_min over transform) costs
  * ~k allocations per element.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
      child.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> input, got ${child.dataType}")
    else if (k <= 0 || k > 1024)
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must be in [1, 1024], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill[Long](k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          // distinct seed per permutation; golden-ratio spread
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes,
            j * 0x9E3779B97F4A7C15L + 42L)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
