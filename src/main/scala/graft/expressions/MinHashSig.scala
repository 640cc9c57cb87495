package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature of a shingle set: one md5-derived base hash per
  * shingle, then k universal-hash permutations
  * h_i(x) = (a_i·x + b_i) mod (2^61-1); signature element i = min over
  * shingles (Broder's min-wise independent permutations). Jaccard(A,B)
  * ≈ fraction of equal signature positions; LSH banding over the
  * signature yields near-dup candidates without the O(n²) cross join.
  *
  * The md5 + Mersenne-arithmetic family (CrossHash) is chosen so the
  * DuckDB oracle recomputes identical signatures — the gate verifies
  * the LSH candidate set itself, not just row counts. One digest per
  * shingle; the k permutations are two arithmetic ops each.
  *
  * Native expression: one pass over the shingle bytes, no boxing,
  * static-call codegen — the interpreted higher-order equivalent
  * (transform over seeds × array_min over transform) costs ~k
  * allocations per element.
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
    else if (k <= 0 || k > CrossHash.MaxPerms)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName k must be in [1, ${CrossHash.MaxPerms}], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import CrossHash._

  def compute(arr: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill[Long](k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val b = arr.getUTF8String(i).getBytes // copy: md5 needs byte[]
        val base = md5Mod(b, 0, b.length)
        var j = 0
        while (j < k) {
          val h = addmod(mulmod(permA(j), base), permB(j))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}
