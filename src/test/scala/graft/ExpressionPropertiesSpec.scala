package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.expressions._

/** Property tests for the native expression kernels (no Spark jobs):
  * 100 deterministic samples per property via seeded ScalaCheck Gens. */
class ExpressionPropertiesSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A]): Seq[A] =
    (1 to 100).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private def arr(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])
  private def larr(xs: Seq[Long]) = new GenericArrayData(xs.toArray)

  test("CrossHash primitives match DuckDB reference values") {
    // duckdb: SELECT md5_number_lower('abc')
    assert(CrossHash.md5Lower64("abc") == 8250560606382298838L)
    // duckdb: SELECT (1234567890123456789::HUGEINT * 987654321098765432 + 42)
    //           % 2305843009213693951
    assert(CrossHash.addmod(
      CrossHash.mulmod(1234567890123456789L, 987654321098765432L),
      42L) == 960075274131157718L)
    // duckdb: SELECT list_reduce([97,98,99]::BIGINT[],
    //           (acc,b) -> (acc::HUGEINT*257 + b) % 2305843009213693951)
    val abc = "abc".getBytes("UTF-8")
    assert(CrossHash.polyHash(abc, 0, 3) == 6432038L)
    // mulmod exercises the 128-bit fold: against BigInt for random pairs
    val P = BigInt(CrossHash.P)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 1000) {
      val a = rnd.nextLong() & ((1L << 61) - 1)
      val b = rnd.nextLong() & ((1L << 61) - 1)
      assert(BigInt(CrossHash.mulmod(a, b)) == (BigInt(a) * BigInt(b)) % P)
    }
  }

  test("pq kernels equal brute-force references") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-2000000L, 2000000L))
    val gen = for {
      sub <- vecGen
      cents <- Gen.listOfN(16, vecGen)
    } yield (sub, cents)
    for ((sub, cents) <- samples(gen)) {
      val expected = cents.map(c =>
        sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      val dists = PqDists.compute(larr(sub),
        new GenericArrayData(cents.map(c => larr(c)).toArray[Any]))
      assert((0 until 16).map(dists.getLong) == expected)
      // first-minimum argmin (ties toward the smaller index)
      val idx = ArgminLong.compute(larr(expected))
      assert(expected(idx.toInt) == expected.min)
      assert(!expected.take(idx.toInt).exists(_ == expected.min))
      assert(L2Long.compute(larr(sub), larr(cents.head)) == expected.head)
    }
    // ADC lookup: dtab[s*k + code[s]] summed
    val adcGen = for {
      codes <- Gen.listOfN(8, Gen.chooseNum(0L, 15L))
      dtab <- Gen.listOfN(128, Gen.chooseNum(0L, 1000000L))
    } yield (codes, dtab)
    for ((codes, dtab) <- samples(adcGen)) {
      val expected = codes.zipWithIndex.map { case (c, s) => dtab(s * 16 + c.toInt) }.sum
      assert(PqAdc.compute(larr(codes), larr(dtab), 16) == expected)
    }
  }

  test("sorted_jaccard equals naive set jaccard") {
    val gen = for {
      a <- Gen.listOf(Gen.chooseNum(-50L, 50L))
      b <- Gen.listOf(Gen.chooseNum(-50L, 50L))
    } yield (a, b)
    for ((a, b) <- samples(gen)) {
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val expected =
        if (sa.isEmpty && sb.isEmpty) 0.0
        else sa.toSet.intersect(sb.toSet).size.toDouble / sa.toSet.union(sb.toSet).size
      assert(SortedJaccard.compute(larr(sa), larr(sb)) == expected)
    }
  }

  test("simhash is token-order invariant") {
    for (tokens <- samples(Gen.listOf(Gen.alphaStr))) {
      val h1 = SimHash64.compute(arr(tokens))
      val h2 = SimHash64.compute(arr(tokens.reverse))
      assert(h1 == h2) // bit votes commute
    }
  }

  test("minhash signature of a superset is elementwise <= the subset's") {
    val gen = for {
      base <- Gen.nonEmptyListOf(Gen.alphaNumStr)
      extra <- Gen.listOf(Gen.alphaNumStr)
    } yield (base, extra)
    for ((base, extra) <- samples(gen)) {
      val k = 8
      val s1 = MinHashSig.compute(arr(base), k).toLongArray()
      val s2 = MinHashSig.compute(arr(base ++ extra), k).toLongArray()
      assert(s1.zip(s2).forall { case (x, y) => y <= x }) // min over more elements
    }
  }

  test("minhash is order invariant") {
    for (xs <- samples(Gen.nonEmptyListOf(Gen.alphaNumStr))) {
      val k = 8
      val s1 = MinHashSig.compute(arr(xs), k).toLongArray().toSeq
      val s2 = MinHashSig.compute(arr(xs.reverse), k).toLongArray().toSeq
      assert(s1 == s2)
    }
  }

  test("winnowing guarantee: shared substring of length >= k+w-1 shares a fingerprint") {
    val gen = for {
      shared <- Gen.listOfN(16, Gen.alphaChar).map(_.mkString) // 16 >= k+w-1 = 11
      p1 <- Gen.alphaStr
      p2 <- Gen.alphaStr
    } yield (p1 + shared, shared + p2)
    for ((t1, t2) <- samples(gen)) {
      val f1 = WinnowFingerprint.compute(UTF8String.fromString(t1), 8, 4).toLongArray().toSet
      val f2 = WinnowFingerprint.compute(UTF8String.fromString(t2), 8, 4).toLongArray().toSet
      assert(f1.intersect(f2).nonEmpty, s"no shared fingerprint for '$t1' / '$t2'")
    }
  }

  test("cosine similarity is symmetric and bounded") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f))
    val gen = for { a <- vecGen; b <- vecGen } yield (a, b)
    for ((a, b) <- samples(gen)) {
      val fa = new GenericArrayData(a.toArray)
      val fb = new GenericArrayData(b.toArray)
      val c1 = CosineSimilarity.compute(fa, fb)
      val c2 = CosineSimilarity.compute(fb, fa)
      assert(c1 == c2)
      assert(c1 >= -1.0000001 && c1 <= 1.0000001)
    }
  }

  test("hyperplane buckets are stable and within range") {
    val vecGen = Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f))
    for (v <- samples(vecGen)) {
      val fa = new GenericArrayData(v.toArray)
      val b = HyperplaneLsh.compute(fa, 0, 8)
      assert(b == HyperplaneLsh.compute(fa, 0, 8))
      assert(b >= 0 && b < 256)
      // different tables decorrelate: at least sometimes differ handled statistically elsewhere
    }
  }

  test("bounded levenshtein equals min(full levenshtein, k+1) on random pairs") {
    def fullLev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val gen = for {
      a <- Gen.stringOfN(12, Gen.oneOf('a', 'b', 'c'))
      cut <- Gen.choose(0, 12)
      suffix <- Gen.stringOfN(6, Gen.oneOf('a', 'b', 'c', 'd'))
      k <- Gen.choose(0, 6)
    } yield (a, a.take(cut) + suffix, k)
    samples(gen).foreach { case (a, b, k) =>
      val got = BoundedLevenshtein.compute(
        UTF8String.fromString(a), UTF8String.fromString(b), k)
      val want = math.min(fullLev(a, b), k + 1)
      assert(got == want, s"lev_b('$a','$b',$k): $got != $want")
    }
    // degenerate shapes
    assert(BoundedLevenshtein.compute(
      UTF8String.fromString(""), UTF8String.fromString("abc"), 5) == 3)
    assert(BoundedLevenshtein.compute(
      UTF8String.fromString("abc"), UTF8String.fromString(""), 1) == 2)
    assert(BoundedLevenshtein.compute(
      UTF8String.fromString("same"), UTF8String.fromString("same"), 0) == 0)
  }

  test("CharTrigrams equals the code-point sliding-window reference, ASCII and multi-byte") {
    def reference(s: String): Seq[String] = {
      // the oracle semantics: substr(s, i, 3) over CODE POINTS
      val cps = s.codePoints().toArray
      if (cps.length < 3) Seq.empty
      else (0 until cps.length - 2).map(i =>
        new String(cps, i, 3))
    }
    def got(s: String): Seq[String] = {
      val a = CharTrigrams.compute(UTF8String.fromString(s))
      (0 until a.numElements()).map(i =>
        a.getUTF8String(i).toString)
    }
    // seeded random mixes of ASCII, accents, CJK, and an emoji
    // (4-byte, surrogate pair in UTF-16 — the boundary case that
    // breaks any UTF-16-code-unit implementation)
    val alphabet = Gen.oneOf('a', 'z', ' ', 'é', 'ß', '中', '文')
    val gen = for {
      n <- Gen.choose(0, 40)
      s <- Gen.stringOfN(n, alphabet)
      emoji <- Gen.oneOf("", "😀") // 😀
      cut <- Gen.choose(0, n)
    } yield s.take(cut) + emoji + s.drop(cut)
    samples(gen).foreach { s =>
      assert(got(s) == reference(s), s"trigrams('$s')")
    }
    assert(got("") == Seq.empty && got("ab") == Seq.empty)
    assert(got("abc") == Seq("abc"))
    assert(got("abcd") == Seq("abc", "bcd"))
  }

  test("PatternVotes counts overlapping occurrences, any language cardinality") {
    def votesOf(text: String, pats: Seq[(String, Int)]): Seq[Long] = {
      val a = PatternVotes.compute(UTF8String.fromString(text),
        arr(pats.map(_._1)),
        new GenericArrayData(pats.map(p => Int.box(p._2)).toArray[Any]))
      (0 until a.numElements()).map(a.getLong)
    }
    def referenceCount(text: String, pat: String): Long = {
      // overlapping code-point-window occurrences
      val cps = text.codePoints().toArray
      if (cps.length < 3) 0L
      else (0 until cps.length - 2).count(i => new String(cps, i, 3) == pat).toLong
    }
    // small cardinality sanity: lang 1 owns both trigrams (2+2 hits)
    assert(votesOf("ababab", Seq(("aba", 0), ("bab", 1), ("aba", 1)))
      == Seq(2L, 4L))
    // multi-word bitset path: 130 languages (3 mask words), the shared
    // pattern's languages straddle word boundaries (0, 63, 64, 129)
    val langsAtBits = Seq(0, 63, 64, 129)
    val pats130 = langsAtBits.map(l => ("中文字", l)) ++ Seq(("xyz", 100))
    val text = "a中文字b中文字中文字xyzzy"
    val v = votesOf(text, pats130)
    assert(v.length == 130)
    val expectShared = referenceCount(text, "中文字")
    assert(expectShared == 3L)
    langsAtBits.foreach(l => assert(v(l) == expectShared, s"lang $l"))
    assert(v(100) == referenceCount(text, "xyz"))
    assert((0 until 130).filterNot(l => langsAtBits.contains(l) || l == 100)
      .forall(l => v(l) == 0L))
    // randomized agreement with the reference on dense ASCII patterns
    val alphabet = Gen.oneOf('a', 'b', 'c')
    val gen = for {
      n <- Gen.choose(0, 60)
      s <- Gen.stringOfN(n, alphabet)
      nl <- Gen.choose(1, 200)
    } yield (s, nl)
    samples(gen).foreach { case (s, nl) =>
      val all = for (x <- "abc"; y <- "abc"; z <- "abc") yield s"$x$y$z"
      val pats = all.zipWithIndex.map { case (p, i) => (p, i % nl) }
      val got = votesOf(s, pats)
      // vote vector length = max assigned index + 1 (data-derived)
      assert(got.length == pats.map(_._2).max + 1)
      val want = Array.fill(got.length)(0L)
      pats.foreach { case (p, l) => want(l) += referenceCount(s, p) }
      assert(got == want.toSeq, s"text='$s' nl=$nl")
    }
  }
}
