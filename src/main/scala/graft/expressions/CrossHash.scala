package graft.expressions

import java.security.MessageDigest

/** Cross-engine-computable hash primitives over the Mersenne prime
  * p = 2^61 - 1. Every randomized operator (minhash, simhash,
  * hyperplane LSH, winnowing) derives its hash family from these, so
  * the DuckDB oracle can recompute the exact same values with
  * `md5_number_lower(...)` + HUGEINT modular arithmetic — the gate then
  * checks the full output, not just row counts.
  *
  * Values stay in [0, 2^61), so signed-long comparisons on the Spark
  * side order identically to DuckDB's unsigned/HUGEINT comparisons.
  */
object CrossHash {

  /** 2^61 - 1 (Mersenne prime: x mod P folds with shifts, no division). */
  final val P: Long = (1L << 61) - 1

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Lower 64 bits of md5, matching DuckDB's `md5_number_lower`:
    * little-endian u64 of digest bytes [8, 16). Result is a full
    * unsigned 64-bit value in a signed long carrier. */
  def md5Lower64(bytes: Array[Byte], offset: Int, len: Int): Long = {
    val d = md5.get()
    d.reset()
    d.update(bytes, offset, len)
    val dig = d.digest()
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (dig(i) & 0xffL); i -= 1 }
    h
  }

  def md5Lower64(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    md5Lower64(b, 0, b.length)
  }

  /** md5Lower64 reduced into [0, P). Oracle form: `md5_number_lower(s) % P`. */
  def md5Mod(bytes: Array[Byte], offset: Int, len: Int): Long =
    java.lang.Long.remainderUnsigned(md5Lower64(bytes, offset, len), P)

  def md5Mod(s: String): Long =
    java.lang.Long.remainderUnsigned(md5Lower64(s), P)

  /** (a * b) mod P for 0 <= a, b < 2^62. 128-bit product split via
    * multiplyHigh, folded with 2^64 ≡ 8 (mod P). */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val him = java.lang.Long.remainderUnsigned(hi, P)
    val lom = java.lang.Long.remainderUnsigned(lo, P)
    val t = java.lang.Long.remainderUnsigned(him << 3, P)
    val s = t + lom
    if (java.lang.Long.compareUnsigned(s, P) >= 0) s - P else s
  }

  /** (a + b) mod P for 0 <= a, b < P. */
  def addmod(a: Long, b: Long): Long = {
    val s = a + b
    if (s >= P) s - P else s
  }

  /** Polynomial hash of a byte range, base 257 mod P, seeded with the
    * first byte — exactly DuckDB's
    * `list_reduce(bytes, (acc, b) -> (acc * 257 + b) % P)`. */
  def polyHash(bytes: Array[Byte], offset: Int, len: Int): Long = {
    if (len <= 0) return 0L
    var h = bytes(offset) & 0xffL
    var i = 1
    while (i < len) {
      h = addmod(mulmod(h, 257L), bytes(offset + i) & 0xffL)
      i += 1
    }
    h
  }

  /** Universal-hash multipliers/offsets for minhash permutations,
    * derived from md5 so the oracle regenerates them inline:
    * a_i = md5_number_lower('minhash-a-' || i) % (P-1) + 1,
    * b_i = md5_number_lower('minhash-b-' || i) % P. */
  final val MaxPerms = 64
  val permA: Array[Long] = Array.tabulate(MaxPerms) { i =>
    java.lang.Long.remainderUnsigned(md5Lower64(s"minhash-a-$i"), P - 1) + 1
  }
  val permB: Array[Long] = Array.tabulate(MaxPerms) { i =>
    java.lang.Long.remainderUnsigned(md5Lower64(s"minhash-b-$i"), P)
  }
}
