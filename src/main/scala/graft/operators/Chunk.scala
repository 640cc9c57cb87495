package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Fixed-size overlapping document chunking — the retrieval/indexing
  * prep step (RAG, embedding-table build, long-doc truncation) that
  * turns each document into a deterministic set of character windows.
  *
  * Chunk i of a document covers characters [i*Stride, i*Stride+Size);
  * the final chunk is the short tail. The whole operator is pure
  * row-local fan-out — sequence + explode + substr inside one
  * whole-stage-codegen span, ZERO shuffles — so it scales as a map-only
  * pass no matter the corpus size: 100 TB in, ~1.25x that out, never a
  * wide dependency. Chunk identity travels as md5(chunk_text) so a
  * downstream exact-dedup or embedding join keys on a 32-byte hash, not
  * the text payload.
  */
object Chunk {

  /** Window width in characters. */
  final val Size = 400
  /** Window start-to-start distance; Size - Stride = 80 chars overlap. */
  final val Stride = 320

  def docChunk(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("n"))
      // exact integer chunk count: 1 + ceil((n - Size) / Stride) for n > Size
      .withColumn("nchunks",
        when(col("n") <= Size, 1L)
          .otherwise(expr(s"(n - $Size + ${Stride - 1}) DIV $Stride") + 1L))
      .select(col("doc_id"), col("text"), col("n"),
        explode(sequence(lit(0L), col("nchunks") - 1L)).as("chunk_idx"))
      .withColumn("chunk_start", col("chunk_idx") * Stride)
      .withColumn("chunk_text",
        col("text").substr(col("chunk_start").cast("int") + 1, lit(Size)))
      .select(
        col("doc_id"), col("chunk_idx"), col("chunk_start"),
        length(col("chunk_text")).cast("long").as("chunk_len"),
        size(filter(split(col("chunk_text"), " "), t => t =!= ""))
          .cast("long").as("n_tokens"),
        md5(col("chunk_text")).as("chunk_hash"))
  }
}
