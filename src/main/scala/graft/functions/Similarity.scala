package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import org.apache.spark.sql.functions._
import graft.expressions.{CosineSimilarity, HyperplaneLsh, MinHashSig, SimHash64, WinnowFingerprint}

/** Column wrappers over the native similarity expressions. */
object Similarity {

  /** Cosine similarity of two float-array embeddings (double result). */
  def cosine(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  /** 64-bit SimHash of a token array. */
  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))

  /** k-element MinHash signature of a shingle array. */
  def minhashSig(shingles: Column, k: Int): Column =
    column(MinHashSig(expression(shingles), k))

  /** Winnowing fingerprint set of a text column. */
  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    column(WinnowFingerprint(expression(text), k, w))

  /** Random-hyperplane LSH bucket of an embedding (one of L tables). */
  def lshBucket(vec: Column, table: Int = 0, numPlanes: Int = 8): Column =
    column(HyperplaneLsh(expression(vec), table, numPlanes))

  /** Jaccard of two sorted-distinct long arrays (two-pointer merge). */
  def sortedJaccard(a: Column, b: Column): Column =
    column(graft.expressions.SortedJaccard(expression(a), expression(b)))

  /** Cross-engine string hash (md5 lower-64 mod 2^61-1). */
  def md5Mod(s: Column): Column =
    column(graft.expressions.Md5Mod61(expression(s)))

  /** Bracket-refinement kernel: (#(boundaries ≤ v) << 1) | in-bracket
    * (see expressions/SegmentHot.scala and operators/ExactQuantile). */
  def segmentHot(v: Column, los: Column, his: Column): Column =
    column(graft.expressions.SegmentHot(
      expression(v), expression(los), expression(his)))

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Per-language occurrence votes of the broadcast profile trigrams
    * in one text scan (see expressions/PatternVotes.scala). */
  def patternVotes(text: Column, tris: Column, lidx: Column): Column =
    column(graft.expressions.PatternVotes(
      expression(text), expression(tris), expression(lidx)))
}
