package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD
  * 2003): hash every k-byte gram, slide a w-hash window, keep the
  * rightmost minimum per window, return the distinct sorted mins.
  * Guarantees any shared substring of length ≥ k+w-1 yields a shared
  * fingerprint, at ~1/w the storage of full k-gram hashing.
  *
  * Gram hash = Rabin-style polynomial, base 257 mod 2^61-1
  * (CrossHash.polyHash), so the DuckDB oracle recomputes identical
  * fingerprints with list_reduce over the gram's byte values.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType}")
    else if (k <= 0 || w <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0 and w > 0, got k=$k w=$w")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WinnowFingerprint.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val nGrams = bytes.length - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.emptyLongArray)
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      grams(i) = CrossHash.polyHash(bytes, i, k)
      i += 1
    }
    // sliding-window rightmost-min via monotonic deque: O(n) total
    val nWin = math.max(nGrams - w + 1, 1)
    val deque = new Array[Int](nGrams) // indices, increasing, values non-decreasing
    var head = 0
    var tail = 0
    val picks = new Array[Long](nWin)
    var nPicks = 0
    var lastIdx = -1
    var m = 0
    while (m < nGrams) {
      // rightmost min ⇒ pop equal values too
      while (tail > head && grams(deque(tail - 1)) >= grams(m)) tail -= 1
      deque(tail) = m; tail += 1
      val j = m - w + 1 // window [j, m]
      if (j >= 0 || m == nGrams - 1) {
        while (deque(head) < math.max(j, 0)) head += 1
        val idx = deque(head)
        if (idx != lastIdx) { picks(nPicks) = grams(idx); nPicks += 1; lastIdx = idx }
      }
      m += 1
    }
    // distinct + sort without a tree
    val sorted = java.util.Arrays.copyOf(picks, nPicks)
    java.util.Arrays.sort(sorted)
    var o = 0
    var i2 = 0
    while (i2 < nPicks) {
      if (o == 0 || sorted(i2) != sorted(o - 1)) { sorted(o) = sorted(i2); o += 1 }
      i2 += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sorted, o))
  }
}
