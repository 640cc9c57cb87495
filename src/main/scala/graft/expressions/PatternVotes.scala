package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern occurrence-vote kernel for trigram language ID
  * (operators/TextMetrics.langIdTrigram): given a document and the
  * broadcast profile table — `tris` (the ≤ K·|langs| profile
  * trigrams) and `lidx` (each pattern's language index into the
  * caller's sorted language array) — returns one long per language:
  * the total occurrences in the text of that language's profile
  * trigrams, scanning the document's bytes ONCE.
  *
  * This replaces the scoring pass's explode-join-aggregate (re-stream
  * every character trigram of the corpus — ~10⁹ rows at sf1 — through
  * a broadcast join against the 200-row profile table and a
  * (doc, lang) count shuffle) with a row-local projection: the votes
  * vector is complete before any exchange, and the argmax is array
  * arithmetic. Trigram positions are code-point starts (identical to
  * CharTrigrams, which generates the profile side), and every
  * overlapping occurrence counts, exactly like the exploded stream.
  * UTF-8 is self-synchronizing, so a byte-level match of a whole
  * pattern can only land on a code-point boundary — byte equality is
  * trigram equality.
  *
  * The probe table over the patterns (open-addressed, FNV-1a over the
  * pattern bytes, per-language bitmask per distinct trigram) is built
  * once per thread and reused while the checksum of the pattern
  * arrays is unchanged — the rebuild test costs one ~600-byte hash
  * per row, noise next to the document scan. Language cardinality is
  * unbounded: the per-trigram language mask is a flat multi-word
  * bitset (⌈|langs|/64⌉ longs per entry), touched only at table build
  * and in the final per-entry scatter — the per-byte scan loop never
  * reads it, so a 500-language corpus costs the same document scan as
  * a 5-language one. */
case class PatternVotes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pattern_votes"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string document, got ${first.dataType}")
    else if (!second.dataType.isInstanceOf[ArrayType] ||
      second.dataType.asInstanceOf[ArrayType].elementType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> patterns, got ${second.dataType}")
    else if (!third.dataType.isInstanceOf[ArrayType] ||
      third.dataType.asInstanceOf[ArrayType].elementType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int> language indexes, got ${third.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(text: Any, tris: Any, lidx: Any): Any =
    PatternVotes.compute(text.asInstanceOf[UTF8String],
      tris.asInstanceOf[ArrayData], lidx.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p, l) =>
      s"graft.expressions.PatternVotes.compute($t, $p, $l)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PatternVotes =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PatternVotes {
  /** Per-thread pattern table, rebuilt only when the checksum of the
    * broadcast pattern arrays changes (each worker thread sees the
    * same one-row broadcast for the whole stage). */
  private final class Table(
      val checksum: Long,
      val nLangs: Int,
      // words per entry in the flat language bitset (⌈nLangs/64⌉)
      val nWords: Int,
      // open-addressed slots: index into the entry arrays, or -1
      val slots: Array[Int],
      val hashes: Array[Long],
      val bytes: Array[Array[Byte]],
      // entry e's language bits live at masks[e*nWords, (e+1)*nWords)
      val masks: Array[Long]) {
    val mask: Int = slots.length - 1
  }
  private val cached = new ThreadLocal[Table]

  private def fnv(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def checksumOf(tris: ArrayData, lidx: ArrayData): Long = {
    var h = 0xcbf29ce484222325L
    val n = tris.numElements()
    var i = 0
    while (i < n) {
      if (!tris.isNullAt(i)) {
        val s = tris.getUTF8String(i)
        val b = s.getBytes
        h ^= fnv(b, 0, b.length)
        h *= 0x100000001b3L
      }
      h ^= (if (lidx.isNullAt(i)) -1L else lidx.getInt(i).toLong)
      h *= 0x100000001b3L
      i += 1
    }
    h ^ (n.toLong << 32)
  }

  private def build(checksum: Long, tris: ArrayData, lidx: ArrayData): Table = {
    val n = tris.numElements()
    require(lidx.numElements() == n,
      s"pattern_votes pattern/index arrays differ in length: $n vs ${lidx.numElements()}")
    var nLangs = 0
    val pb = new Array[Array[Byte]](n)
    val pl = new Array[Int](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (!tris.isNullAt(i) && !lidx.isNullAt(i)) {
        pb(k) = tris.getUTF8String(i).getBytes
        pl(k) = lidx.getInt(i)
        require(pl(k) >= 0,
          s"pattern_votes language indexes must be non-negative, got ${pl(k)}")
        if (pl(k) + 1 > nLangs) nLangs = pl(k) + 1
        k += 1
      }
      i += 1
    }
    val nWords = math.max(1, (nLangs + 63) >>> 6)
    // dedupe identical trigrams across languages into one bitset entry
    var cap = 4
    while (cap < 4 * math.max(k, 1)) cap <<= 1
    val slots = Array.fill(cap)(-1)
    val hashes = new Array[Long](k)
    val bytes = new Array[Array[Byte]](k)
    val masks = new Array[Long](k * nWords)
    var nEnt = 0
    i = 0
    while (i < k) {
      val b = pb(i)
      val h = fnv(b, 0, b.length)
      var s = (h & (cap - 1)).toInt
      var found = -1
      while (found < 0 && slots(s) >= 0) {
        val e = slots(s)
        if (hashes(e) == h && java.util.Arrays.equals(bytes(e), b)) found = e
        else s = (s + 1) & (cap - 1)
      }
      val e = if (found >= 0) found else {
        slots(s) = nEnt
        hashes(nEnt) = h
        bytes(nEnt) = b
        nEnt += 1
        nEnt - 1
      }
      masks(e * nWords + (pl(i) >>> 6)) |= 1L << (pl(i) & 63)
      i += 1
    }
    new Table(checksum, nLangs, nWords,
      slots, hashes.take(nEnt), bytes.take(nEnt), masks.take(nEnt * nWords))
  }

  def compute(text: UTF8String, tris: ArrayData, lidx: ArrayData): ArrayData = {
    val ck = checksumOf(tris, lidx)
    var t = cached.get()
    if (t == null || t.checksum != ck) {
      t = build(ck, tris, lidx)
      cached.set(t)
    }
    val votes = new Array[Long](t.nLangs)
    if (t.bytes.length == 0) return new GenericArrayData(votes.map(Long.box))
    val nChars = text.numChars()
    if (nChars >= 3) {
      val b = text.getBytes
      // rolling window of 4 code-point start offsets: [k, k+3)
      var o0 = 0
      var o1 = o0 + UTF8String.numBytesForFirstByte(b(o0))
      var o2 = o1 + UTF8String.numBytesForFirstByte(b(o1))
      var k = 0
      val last = nChars - 3
      // per-entry hit counters: scatter into votes once at the end
      val hits = new Array[Long](t.bytes.length)
      while (k <= last) {
        val o3 = o2 + UTF8String.numBytesForFirstByte(b(o2))
        val h = fnv(b, o0, o3)
        var s = (h & t.mask).toInt
        var cont = true
        while (cont) {
          val e = t.slots(s)
          if (e < 0) cont = false
          else {
            if (t.hashes(e) == h && eq(t.bytes(e), b, o0, o3)) {
              hits(e) += 1
              cont = false
            } else s = (s + 1) & t.mask
          }
        }
        o0 = o1; o1 = o2; o2 = o3
        k += 1
      }
      var e = 0
      while (e < hits.length) {
        if (hits(e) != 0L) {
          var w = 0
          while (w < t.nWords) {
            var m = t.masks(e * t.nWords + w)
            while (m != 0L) {
              val l = (w << 6) + java.lang.Long.numberOfTrailingZeros(m)
              votes(l) += hits(e)
              m &= m - 1
            }
            w += 1
          }
        }
        e += 1
      }
    }
    new GenericArrayData(votes.map(Long.box))
  }

  private def eq(pat: Array[Byte], b: Array[Byte], from: Int, until: Int): Boolean = {
    if (pat.length != until - from) return false
    var i = 0
    while (i < pat.length) {
      if (pat(i) != b(from + i)) return false
      i += 1
    }
    true
  }
}
