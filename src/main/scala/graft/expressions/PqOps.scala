package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels as codegen'd expressions. The PQ
  * operator's hot loops (K×Dsub distance sweeps per subvector, M table
  * lookups per candidate pair) would otherwise run as nested
  * higher-order functions — interpreted per row with an array
  * allocation per lambda — which measured ~5× slower at the 10× probe
  * scale. Each kernel here is one tight JIT'd loop over ArrayData with
  * at most one output allocation, and stays inside whole-stage codegen.
  *
  * All arithmetic is exact long math on floor(x·2^20)-quantized
  * coordinates (Cluster.scala convention), so results are
  * bit-identical to the DuckDB oracle's integer replay.
  */

/** All K exact L2 distances of one subvector against a K-row codebook
  * (array of K quantized centroid subvectors). */
case class PqDists(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_dists"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<array<bigint>>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqDists.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.PqDists.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqDists =
    copy(left = newLeft, right = newRight)
}

object PqDists {
  def compute(sub: ArrayData, cents: ArrayData): ArrayData = {
    val k = cents.numElements()
    val d = sub.numElements()
    val out = new Array[Long](k)
    var c = 0
    while (c < k) {
      val cq = cents.getArray(c)
      if (cq.numElements() != d)
        throw new IllegalArgumentException(
          s"pq_dists: centroid $c has ${cq.numElements()} dims, subvector has $d")
      var acc = 0L
      var j = 0
      while (j < d) {
        val diff = sub.getLong(j) - cq.getLong(j)
        acc += diff * diff
        j += 1
      }
      out(c) = acc
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** Index of the first minimum of a long array — the assignment argmin
  * with ties toward the smaller centroid id. */
case class ArgminLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "argmin_long"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    ArgminLong.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.ArgminLong.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): ArgminLong =
    copy(child = newChild)
}

object ArgminLong {
  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    if (n == 0)
      throw new IllegalArgumentException("argmin_long: empty array has no argmin")
    var best = a.getLong(0)
    var idx = 0
    var i = 1
    while (i < n) {
      val v = a.getLong(i)
      if (v < best) { best = v; idx = i }
      i += 1
    }
    idx.toLong
  }
}

/** ADC total: sum over subspaces s of dtab[s*k + codes[s]] — M exact
  * table lookups per (query, vector) candidate pair. */
case class PqAdc(left: Expression, right: Expression, k: Int) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqAdc.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.PqAdc.compute($a, $b, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def compute(codes: ArrayData, dtab: ArrayData, k: Int): Long = {
    val m = codes.numElements()
    if (dtab.numElements() != m * k)
      throw new IllegalArgumentException(
        s"pq_adc: lookup table has ${dtab.numElements()} entries, expected $m subspaces x $k codes")
    var acc = 0L
    var s = 0
    while (s < m) {
      val code = codes.getLong(s)
      if (code < 0 || code >= k)
        throw new IllegalArgumentException(
          s"pq_adc: code $code at subspace $s outside [0, $k)")
      acc += dtab.getLong(s * k + code.toInt)
      s += 1
    }
    acc
  }
}

/** All M subspace assignments of one FULL quantized vector against a
  * FLAT codebook laid out book[(s*K + c)*Dsub + j] — the whole encode
  * step as one row-local kernel. Replaces the exploded formulation
  * (posexplode to M rows per vector → per-subspace broadcast join →
  * collect_list pivot back), which paid an 8× cached explode and a
  * corpus-wide pivot shuffle for what is a pure per-row loop. Argmin
  * ties break toward the smaller centroid id (first minimum), matching
  * ArgminLong / the oracle's ORDER BY dist, c_id. */
case class PqAssign(left: Expression, right: Expression, m: Int, k: Int, dsub: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_assign"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqAssign.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, k, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.PqAssign.compute($a, $b, $m, $k, $dsub)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAssign =
    copy(left = newLeft, right = newRight)
}

object PqAssign {
  def compute(q: ArrayData, book: ArrayData, m: Int, k: Int, dsub: Int): ArrayData = {
    if (q.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_assign: vector has ${q.numElements()} dims, expected $m x $dsub")
    if (book.numElements() != m * k * dsub)
      throw new IllegalArgumentException(
        s"pq_assign: codebook has ${book.numElements()} entries, expected $m x $k x $dsub")
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      var best = Long.MaxValue
      var bi = 0
      var c = 0
      while (c < k) {
        val base = (s * k + c) * dsub
        var acc = 0L
        var j = 0
        while (j < dsub) {
          val diff = q.getLong(s * dsub + j) - book.getLong(base + j)
          acc += diff * diff
          j += 1
        }
        if (acc < best) { best = acc; bi = c }
        c += 1
      }
      out(s) = bi.toLong
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** The per-query ADC lookup table — all M×K exact subspace distances
  * of one full query vector against the flat codebook, laid out
  * dtab[s*K + c] (the layout PqAdc indexes). Row-local: replaces the
  * exploded per-subspace distance rows + collect_list flatten pivot. */
case class PqTab(left: Expression, right: Expression, m: Int, k: Int, dsub: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_tab"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqTab.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, k, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.PqTab.compute($a, $b, $m, $k, $dsub)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqTab =
    copy(left = newLeft, right = newRight)
}

object PqTab {
  def compute(q: ArrayData, book: ArrayData, m: Int, k: Int, dsub: Int): ArrayData = {
    if (q.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"pq_tab: vector has ${q.numElements()} dims, expected $m x $dsub")
    if (book.numElements() != m * k * dsub)
      throw new IllegalArgumentException(
        s"pq_tab: codebook has ${book.numElements()} entries, expected $m x $k x $dsub")
    val out = new Array[Long](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val base = (s * k + c) * dsub
        var acc = 0L
        var j = 0
        while (j < dsub) {
          val diff = q.getLong(s * dsub + j) - book.getLong(base + j)
          acc += diff * diff
          j += 1
        }
        out(s * k + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Exact long L2 over two equal-length quantized vectors (the rerank
  * distance — one tight loop instead of zip_with + aggregate). */
case class L2Long(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "l2_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    L2Long.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.L2Long.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): L2Long =
    copy(left = newLeft, right = newRight)
}

object L2Long {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"l2_long: length mismatch ($n vs ${b.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      val diff = a.getLong(i) - b.getLong(i)
      acc += diff * diff
      i += 1
    }
    acc
  }
}
