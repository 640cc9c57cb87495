package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** A multimodal record: opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** Typed metadata a decoder emits per media payload. */
case class MediaMeta(doc_id: Long, byte_len: Long, sha256: String,
    magic: String, width: Int, height: Int)

/** Multimodal plumbing: treat image/audio/video as opaque `binary`
  * columns and run the decode/feature-extract step partition-wise over
  * a typed Dataset — the Scala analogue of a Pandas-UDF `mapInPandas`
  * stage: the executor sees an iterator of records per partition and
  * can batch them into a native decoder.
  *
  * The decode itself is a STUB (no image/audio libs in this container):
  * deterministic dimensions derived from payload length + id. The
  * Spark-side contract — binary column, Encoder schema, per-partition
  * iterator, metadata projection — is the real, tested part.
  */
object Multimodal {

  /** STUB decoder: a real deployment calls the native library here
    * (one call per batch, inside the partition iterator). The digest
    * instance is created once per partition and reset per record —
    * no per-row provider lookup on the batch hot path. */
  private def decodeStub(digest: java.security.MessageDigest)(r: MediaRecord): MediaMeta = {
    digest.reset()
    val sha = digest.digest(r.payload).map("%02x".format(_)).mkString
    val magic = r.payload.take(4).map("%02X".format(_)).mkString
    MediaMeta(r.doc_id, r.payload.length.toLong, sha, magic,
      width = (16 + r.payload.length % 64).toInt,
      height = (16 + r.doc_id % 48).toInt)
  }

  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRecord] = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    media
      .mapPartitions { it => // batch boundary = partition
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map(decodeStub(digest))
      }
      .toDF()
  }

  /** Per-payload feature vector a media pipeline extracts after decode:
    * byte stats, entropy, and sampled frame fingerprints. */
  case class MediaFeatures(doc_id: Long, byte_len: Long, mean_byte: Double,
      entropy: Double, n_frames: Long, frame_hashes: Array[Long])

  private final val FrameBytes = 16
  private final val FrameStride = 4

  /** Feature extraction over the opaque payload, partition-wise like
    * the decode: mean byte (exact integer sum → one division), byte
    * entropy in bits (computed in ascending-byte order and rounded to
    * 6 dp so both engines agree), frame count, and an md5-derived
    * fingerprint of every FrameStride-th FrameBytes-slice — the
    * frame-sampling shape a video pipeline uses, minus the codec.
    *
    * NB the oracle walks CHARACTERS (ord/substr) while this walks
    * UTF-8 BYTES — equal only because the documents corpus is ASCII
    * (verified `^[a-z0-9 ]*$` at every SF). Real binary payloads keep
    * the byte semantics here; an oracle over non-ASCII data would need
    * DuckDB blob slicing instead. */
  private def featureStub(r: MediaRecord): MediaFeatures = {
    val n = r.payload.length
    var sum = 0L
    val counts = new Array[Long](256)
    var i = 0
    while (i < n) {
      val b = r.payload(i) & 0xff
      sum += b
      counts(b) += 1
      i += 1
    }
    // entropy = log2(n) - (Σ_b c_b·log2 c_b)/n, summed ascending b —
    // the same fold order the oracle's sorted-list reduce uses
    var acc = 0.0
    var b = 0
    while (b < 256) {
      if (counts(b) > 0) acc += counts(b).toDouble * (math.log(counts(b).toDouble) / math.log(2.0))
      b += 1
    }
    val ent = if (n == 0) 0.0
      else math.log(n.toDouble) / math.log(2.0) - acc / n
    val entRounded = BigDecimal(ent).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nFrames = n / FrameBytes
    val frames = (0 until nFrames by FrameStride).map { f =>
      graft.expressions.CrossHash.md5Mod(r.payload, f * FrameBytes, FrameBytes)
    }.toArray
    MediaFeatures(r.doc_id, n.toLong, if (n == 0) 0.0 else sum.toDouble / n,
      entRounded, nFrames.toLong, frames)
  }

  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .mapPartitions(_.map(featureStub))
      .toDF()
  }
}
