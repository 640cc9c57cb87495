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
    * (one call per batch, inside the partition iterator). */
  private def decodeStub(r: MediaRecord): MediaMeta = {
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(r.payload).map("%02x".format(_)).mkString
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
      .mapPartitions(_.map(decodeStub)) // batch boundary = partition
      .toDF()
  }
}
