package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.operators.Sketch

/** One (source, register-candidate) row routed into the sketch. */
case class HllTok(source: String, bucket: Long, rho: Int)

/** The 256 max-rho registers carried between micro-batches. */
case class HllState(regs: Seq[Int])

/** Sketch snapshot emitted per source per micro-batch. */
case class HllUpdate(source: String, n_zero_regs: Long, reg_sum: Double,
    hll_est: Double)

/** One (token, hash-row, cell) occurrence routed into the CMS. */
case class CmsTok(token: String, d: Int, bucket: Int)

/** CMS state: Depth×Width cells plus the tracked-candidate map
  * (term -> its Depth cell indices). Both bounded: cells are constant,
  * candidates capped at CmsCap by lowest-estimate eviction. */
case class CmsState(cells: Seq[Long], terms: Map[String, Seq[Int]], gen: Long)

/** One heavy-hitter row emitted per micro-batch generation. */
case class CmsHh(gen: Long, term: String, cms_est: Long)

/** One (source, perm, hash) row routed into the minhash state. */
case class MhTok(source: String, i: Long, h: Long)
/** Per-source signature state: MhPerms running minima + generation. */
case class MhState(mins: Seq[Long], gen: Long)
/** A signature row emitted per micro-batch per source. */
case class MhSig(source: String, gen: Long, i: Long, m: Long)

/** Streaming sketch maintenance over a document stream — the proof
  * that the fixed-memory sketches are MERGEABLE state, which is their
  * whole reason to exist at 100 TB: per source, the 256 HyperLogLog
  * max-rho registers ride in mapGroupsWithState (1 KB per key,
  * CONSTANT in stream length), each micro-batch folds its tokens in
  * with pointwise max, and every batch emits the refreshed estimate.
  * Registers are duplicate-insensitive and order-insensitive, so the
  * streaming fold needs no dedup state and no ordering contract —
  * exactly-once, at-least-once, and out-of-order delivery all yield
  * the identical final registers (StreamingSpec asserts final-state
  * parity with the batch operator across chronological file slices).
  *
  * The hash→(bucket, rho) projection is the SAME column expression the
  * batch operator compiles (Sketch.hllBucket/hllRho), so the stream
  * and the gate-checked batch path cannot drift; the estimate math
  * (exact BigInt harmonic sum → one double divide, linear-counting
  * takeover below the 2.5m knee) restates the batch formula on the
  * driver side of the state boundary. */
object DocStreams {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Unbounded documents source: a parquet directory watched for files. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Tracked-candidate capacity of the streaming CMS (space-saving
    * style eviction above it; the test vocabulary fits inside, so the
    * tracking is exact there and the parity assertion is strict). */
  final val CmsCap = 64
  /** Heavy hitters emitted per micro-batch. */
  final val CmsTopN = 5

  /** Streaming COUNT-MIN heavy hitters: the second mergeable sketch,
    * as stream state. Cells are pure ADDS — order- and batch-
    * insensitive, the mergeability that justifies the sketch — and the
    * candidate set is the classic heavy-hitter companion structure
    * (bounded, lowest-estimate eviction when over capacity). Each
    * micro-batch emits its generation's top-CmsTopN terms by CMS
    * estimate; the LAST generation is the stream's answer.
    *
    * The (token, d, cell) projection is the batch operator's own
    * column expression (Sketch.cmsBucket), so stream and gate-checked
    * batch cells cannot drift. Single-group state here (the test
    * corpus is one sketch); a production deployment shards the cell
    * array by hash range per key-group and merges — the adds commute,
    * which is the whole point. */
  def cmsHeavyHitters(spark: SparkSession, docs: DataFrame): Dataset[CmsHh] = {
    import spark.implicits._
    val depth = Sketch.Depth
    val width = Sketch.Width
    val cap = CmsCap
    val topN = CmsTopN

    def step(key: Int, rows: Iterator[CmsTok],
        state: GroupState[CmsState]): Iterator[CmsHh] = {
      val prev = state.getOption.getOrElse(
        CmsState(Vector.fill(depth * width)(0L), Map.empty, 0L))
      val cells = prev.cells.toArray
      var terms = prev.terms
      rows.foreach { t =>
        cells(t.d * width + t.bucket) += 1L
        val slots = terms.getOrElse(t.token, Vector.fill(depth)(-1))
        terms += t.token -> slots.updated(t.d, t.bucket)
      }
      def est(slots: Seq[Int]): Long =
        slots.zipWithIndex.map { case (b, d) => cells(d * width + b) }.min
      // space-saving eviction: keep the cap best-estimated candidates
      if (terms.size > cap)
        terms = terms.toSeq.sortBy { case (t, s) => (-est(s), t) }.take(cap).toMap
      val gen = prev.gen + 1
      state.update(CmsState(cells.toVector, terms, gen))
      terms.toSeq.map { case (t, s) => (t, est(s)) }
        .sortBy { case (t, e) => (-e, t) }.take(topN)
        .map { case (t, e) => CmsHh(gen, t, e) }.iterator
    }

    docs
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .select(col("token"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select(col("token"), col("d").cast("int").as("d"),
        Sketch.cmsBucket(col("token"), col("d")).cast("int").as("bucket"))
      .as[CmsTok]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  /** Streaming MINHASH SIGNATURE maintenance per source: the third
    * mergeable sketch as stream state — MhPerms minimum hash values in
    * mapGroupsWithState, merged elementwise by MIN. Min is commutative
    * and idempotent, so duplicates, replays, and OUT-OF-ORDER delivery
    * all converge to the batch signature (the firstSeen contract,
    * lifted to a 64-vector); StreamingSpec asserts final-generation
    * parity with Sketch.sourceSignature. Each batch emits the
    * refreshed signature rows stamped with a generation counter —
    * the highest generation per source is the stream's answer.
    *
    * The (source, i, h) projection joins the SAME mhSeeds table and
    * compiles the SAME mhHash expression the batch operator uses, so
    * stream and gate-checked batch signatures cannot drift. */
  def minhashSignature(spark: SparkSession, docs: DataFrame): Dataset[MhSig] = {
    import spark.implicits._
    val perms = Sketch.MhPerms

    def step(source: String, rows: Iterator[MhTok],
        state: GroupState[MhState]): Iterator[MhSig] = {
      val mins = state.getOption.map(_.mins.toArray)
        .getOrElse(Array.fill(perms)(Long.MaxValue))
      rows.foreach { t =>
        val i = t.i.toInt
        if (t.h < mins(i)) mins(i) = t.h
      }
      val gen = state.getOption.map(_.gen + 1).getOrElse(1L)
      state.update(MhState(mins.toSeq, gen))
      mins.iterator.zipWithIndex.filter(_._1 != Long.MaxValue)
        .map { case (m, i) => MhSig(source, gen, i.toLong, m) }
    }

    val seeds = Sketch.mhSeeds(spark).withColumn("k", lit(1))
    docs
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .withColumn("hb", graft.functions.Similarity.md5Mod(col("token")))
      .withColumn("k", lit(1))
      .join(broadcast(seeds), Seq("k"))
      .select(col("source"), col("i"), Sketch.mhHash(col("hb"), col("a"), col("b")).as("h"))
      .as[MhTok]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }

  /** Per-source streaming HLL: emits the refreshed sketch snapshot for
    * every source seen in each micro-batch (Update semantics — the
    * LAST emission per source is the stream's answer). */
  def hllSketch(spark: SparkSession, docs: DataFrame): Dataset[HllUpdate] = {
    import spark.implicits._
    // primitives copied to locals: the state closure must capture
    // neither this singleton nor Sketch's (not serializable)
    val hllC = Sketch.HllC
    val hllM = Sketch.HllM

    def step(source: String, rows: Iterator[HllTok],
        state: GroupState[HllState]): HllUpdate = {
      val regs = state.getOption.map(_.regs.toArray)
        .getOrElse(Array.fill(hllM)(0))
      rows.foreach { t =>
        val b = t.bucket.toInt
        if (t.rho > regs(b)) regs(b) = t.rho
      }
      state.update(HllState(regs.toSeq))
      // the batch estimate formula restated on exact integers: BigInt
      // harmonic sum (correctly-rounded toDouble), one IEEE divide,
      // linear-counting takeover below the 2.5m knee, round to 6
      val zeros = regs.count(_ == 0).toLong
      val sD = regs.map(r => BigInt(1) << (62 - r)).sum.toDouble
      val raw = hllC / sD
      val est =
        if (raw <= 2.5 * hllM && zeros > 0)
          hllM.toDouble * math.log(hllM.toDouble / zeros)
        else raw
      HllUpdate(source, zeros, sD,
        BigDecimal(est).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }

    docs
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .select(col("source"), Sketch.hllBucket(col("token")).as("bucket"),
        Sketch.hllRho(col("token")).cast("int").as("rho"))
      .as[HllTok]
      .groupByKey(_.source)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(step)
  }
}
