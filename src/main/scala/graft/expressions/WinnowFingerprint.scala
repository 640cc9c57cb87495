package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD
  * 2003): hash every k-byte gram, slide a w-hash window, keep the
  * rightmost minimum per window, return the distinct sorted mins.
  * Guarantees any shared substring of length ≥ k+w-1 yields a shared
  * fingerprint, at ~1/w the storage of full k-gram hashing.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

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
      grams(i) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i, k, 7L)
      i += 1
    }
    val picked = new java.util.TreeSet[java.lang.Long]()
    val nWin = math.max(nGrams - w + 1, 1)
    var j = 0
    while (j < nWin) {
      var min = grams(j)
      var idx = j
      val end = math.min(j + w, nGrams)
      var m = j + 1
      while (m < end) {
        if (grams(m) <= min) { min = grams(m); idx = m } // rightmost min
        m += 1
      }
      picked.add(grams(idx))
      j += 1
    }
    val out = new Array[Long](picked.size)
    val it = picked.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
