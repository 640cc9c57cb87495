package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** A multimodal record: opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** Typed metadata the header decoder emits per media payload. Every
  * field except doc_id is READ FROM THE BYTES — none is derived from
  * the generator's parameters. */
case class MediaMeta(doc_id: Long, media_type: String, byte_len: Long,
    data_bytes: Long, width: Long, height: Long, sample_rate: Long,
    channels: Long, bit_depth: Long, magic: String, content_sha256: String)

/** Multimodal plumbing: treat image/audio/video as opaque `binary`
  * columns and run the decode/feature-extract step partition-wise over
  * a typed Dataset — the Scala analogue of a Pandas-UDF `mapInPandas`
  * stage: the executor sees an iterator of records per partition and
  * can batch them into a native decoder.
  *
  * The metadata decode is REAL byte-format parsing: payloads are valid
  * BMP (BITMAPINFOHEADER) and PCM WAV (RIFF) files, and the decoder
  * reads width/height/bit-depth/sample-rate/channels as little-endian
  * fields at their published header offsets. The payloads themselves
  * are synthesized in the distributed plan (the harness ships parquet,
  * not media files) from one SQL generator expression shared verbatim
  * with the DuckDB oracle, which re-decodes the same header fields
  * from the same bytes via hex-string arithmetic — so a decoder that
  * read any field from the wrong offset, endianness, or width fails
  * the gate hash. */
object Multimodal {

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  /** Signed little-endian i32 — biWidth/biHeight are LONG per
    * BITMAPINFOHEADER; a top-down BMP carries a NEGATIVE biHeight,
    * which an unsigned read would render as ~4.29 billion. */
  private def s32le(b: Array[Byte], o: Int): Long =
    u32le(b, o).toInt.toLong
  /** Big-endian u32 — PNG chunk lengths and IHDR dimensions (network
    * byte order, the opposite endianness axis from BMP/WAV). */
  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Header decoder — one call per record inside the partition
    * iterator, like a native codec would be batched. The digest
    * instance is created once per partition — no per-row provider
    * lookup on the hot path. The content digest is sha256 of the
    * UPPERCASE-HEX RENDERING of the bytes (injective in the payload),
    * because the oracle engine's digest functions accept only VARCHAR;
    * it is still computed here from the raw bytes alone. */
  private def decodeHeader(digest: java.security.MessageDigest)(r: MediaRecord): MediaMeta = {
    val b = r.payload
    val sb = new java.lang.StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) { sb.append(String.format("%02X", Integer.valueOf(b(i) & 0xff))); i += 1 }
    val hx = sb.toString
    digest.reset()
    val sha = digest.digest(hx.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      .map("%02x".format(_)).mkString
    val magic = hx.substring(0, math.min(8, hx.length))
    if (b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte)
      MediaMeta(r.doc_id, "bmp", b.length.toLong,
        data_bytes = u32le(b, 34),         // biSizeImage
        width = s32le(b, 18), height = s32le(b, 22),
        sample_rate = 0L, channels = 0L,
        bit_depth = u16le(b, 28).toLong, magic = magic, content_sha256 = sha)
    else if (b.length >= 44 && b(0) == 'R'.toByte && b(1) == 'I'.toByte &&
        b(2) == 'F'.toByte && b(3) == 'F'.toByte &&
        b(8) == 'W'.toByte && b(9) == 'A'.toByte && b(10) == 'V'.toByte && b(11) == 'E'.toByte)
      MediaMeta(r.doc_id, "wav", b.length.toLong,
        data_bytes = u32le(b, 40),         // data chunk size
        width = 0L, height = 0L,
        sample_rate = u32le(b, 24), channels = u16le(b, 22).toLong,
        bit_depth = u16le(b, 34).toLong, magic = magic, content_sha256 = sha)
    else if (b.length >= 41 && (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte &&
        b(2) == 'N'.toByte && b(3) == 'G'.toByte && (b(4) & 0xff) == 0x0d &&
        (b(5) & 0xff) == 0x0a && (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a)
      // PNG: 8-byte signature, IHDR (width/height BIG-endian at 16/20,
      // bit depth at 24), first IDAT length at 33. Header parse only —
      // chunk CRCs are not verified here (a real decoder's job).
      MediaMeta(r.doc_id, "png", b.length.toLong,
        data_bytes = u32be(b, 33),         // first IDAT chunk length
        width = u32be(b, 16), height = u32be(b, 20),
        sample_rate = 0L, channels = 0L,
        bit_depth = (b(24) & 0xff).toLong, magic = magic, content_sha256 = sha)
    else
      MediaMeta(r.doc_id, "unknown", b.length.toLong, 0L, 0L, 0L, 0L, 0L, 0L, magic, sha)
  }

  /** Decode a binary media column partition-wise (the reusable library
    * entry point — MultimodalSpec feeds it hand-built literal files). */
  def decodeMeta(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => // batch boundary = partition
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map(decodeHeader(digest))
    }.toDF()
  }

  // ---- payload synthesis (shared SQL, Spark + DuckDB dialects) ----

  private def byteHex(v: String) = s"lpad(hex(CAST(FLOOR($v) AS BIGINT) % 256), 2, '0')"
  private def u16hex(v: String) =
    s"(${byteHex(v)} || ${byteHex(s"($v)/256")})"
  private def u32hex(v: String) =
    s"(${byteHex(v)} || ${byteHex(s"($v)/256")} || ${byteHex(s"($v)/65536")} || ${byteHex(s"($v)/16777216")})"
  /** First `len` BYTES of the document rendered as hex, padded with
    * 'x' (0x78) bytes. Slices and pads in HEX SPACE (2 chars = 1 byte,
    * always an even cut) instead of character space, so a multi-byte
    * UTF-8 document cannot hex to more bytes than the header's size
    * fields claim — the byte_len == header + data_bytes invariant
    * holds by construction for ANY input text, not just ASCII. */
  private def dataHex(len: String) =
    s"rpad(substr(upper(hex(text)), 1, CAST(2*($len) AS INT)), CAST(2*($len) AS INT), '78')"

  // BMP: 54-byte BITMAPINFOHEADER file; width/height/row padding per spec
  private val bmpW = "(2 + doc_id % 14)"
  private val bmpH = "(1 + doc_id % 9)"
  private val bmpRow = s"(CAST(FLOOR(($bmpW*3 + 3)/4) AS BIGINT) * 4)" // 4-byte row align
  private val bmpPx = s"($bmpRow * $bmpH)"
  private val bmpHex =
    s"('424D' || ${u32hex(s"$bmpPx + 54")} || '00000000' || '36000000' || '28000000' || " +
      s"${u32hex(bmpW)} || ${u32hex(bmpH)} || '0100' || '1800' || '00000000' || " +
      s"${u32hex(bmpPx)} || '130B0000' || '130B0000' || '00000000' || '00000000' || ${dataHex(bmpPx)})"

  // WAV: 44-byte canonical RIFF/PCM header + 16-bit samples
  private val wavCh = "(CASE WHEN doc_id % 4 < 2 THEN 1 ELSE 2 END)"
  private val wavSr = "(8000 + (doc_id % 8) * 1000)"
  private val wavN = "(8 + doc_id % 32)"
  private val wavBa = s"($wavCh * 2)"
  private val wavData = s"($wavN * $wavBa)"
  private val wavHex =
    s"('52494646' || ${u32hex(s"$wavData + 36")} || '57415645' || '666D7420' || '10000000' || '0100' || " +
      s"${u16hex(wavCh)} || ${u32hex(wavSr)} || ${u32hex(s"$wavSr * $wavBa")} || ${u16hex(wavBa)} || " +
      s"'1000' || '64617461' || ${u32hex(wavData)} || ${dataHex(wavData)})"

  private def u32beHex(v: String) =
    s"(${byteHex(s"($v)/16777216")} || ${byteHex(s"($v)/65536")} || ${byteHex(s"($v)/256")} || ${byteHex(v)})"

  // PNG: signature + IHDR (BE dims, 8-bit RGB) + one IDAT + IEND.
  // Chunk CRCs are zero except IEND's spec constant — the decoder
  // parses headers, it does not checksum (a real codec's job).
  private val pngW = "(1 + doc_id % 13)"
  private val pngH = "(1 + doc_id % 7)"
  private val pngData = s"(($pngW) * ($pngH) * 3)"
  private val pngHex =
    s"('89504E470D0A1A0A' || '0000000D' || '49484452' || ${u32beHex(pngW)} || ${u32beHex(pngH)} || " +
      s"'08' || '02' || '000000' || '00000000' || ${u32beHex(pngData)} || '49444154' || " +
      s"${dataHex(pngData)} || '00000000' || '0000000049454E44AE426082')"

  /** Uppercase-hex of each document's media file — doc_id mod 3:
    * 0 → BMP, 1 → WAV, 2 → PNG (both endianness families). Valid in
    * BOTH SQL dialects over (doc_id, text); the gate oracle embeds
    * this string verbatim, so both engines provably generate identical
    * bytes and then decode them independently. */
  val mediaHexSql: String =
    s"(CASE WHEN doc_id % 3 = 0 THEN $bmpHex WHEN doc_id % 3 = 1 THEN $wavHex ELSE $pngHex END)"

  /** The synthesized media corpus as a binary column (distributed —
    * the generator is one codegen'd projection, no driver state). */
  def mediaPayloads(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    // spread BEFORE synthesizing payloads: the decode/feature
    // consumers are per-row-heavy and the test scan is one row group —
    // without it they run single-task (the shingled() discipline; the
    // payload hex embeds the document text, so the source columns ride
    // the spread and the heavy unhex runs on the parallel side)
    Partitioning.spread(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))
      .selectExpr("doc_id", s"unhex($mediaHexSql) AS payload")
      .as[MediaRecord]
  }

  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame =
    decodeMeta(mediaPayloads(spark, sfDir))

  /** Per-payload feature vector a media pipeline extracts after decode:
    * byte stats, entropy, and sampled frame fingerprints. */
  case class MediaFeatures(doc_id: Long, byte_len: Long, mean_byte: Double,
      entropy: Double, n_frames: Long, frame_hashes: Array[Long])

  private final val FrameBytes = 16
  private final val FrameStride = 4

  /** Full feature extractor (not a stub — every output column is
    * computed from the payload bytes and oracle-checked).
    * Feature extraction over the opaque payload, partition-wise like
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
  private def byteFeatures(r: MediaRecord): MediaFeatures = {
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

  /** Resized-image record: original and output geometry plus a
    * content digest of the COMPLETE resized file, so the oracle must
    * reproduce every output byte (header fields, pixel choice, row
    * padding) to match. */
  case class ResizedMedia(doc_id: Long, in_w: Long, in_h: Long,
      out_w: Long, out_h: Long, out_len: Long, out_sha256: String)

  private def putU32le(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  /** REAL nearest-neighbor 2× downsample of a BMP payload: read the
    * source geometry from the header, sample every 2nd pixel of every
    * 2nd stored row (stored-row parity is identical in both engines, so
    * bottom-up storage order is immaterial), and emit a VALID BMP —
    * fresh size fields, fresh 4-byte row alignment. Output dims are
    * ceil(in/2). */
  def resizeBmpHalf(b: Array[Byte]): Array[Byte] = {
    // the kernel assumes the canonical layout the corpus writes: 54-byte
    // headers (bfOffBits=54), bottom-up 24bpp, no palette. A foreign BMP
    // (palette, top-down, other bfOffBits) must fail loudly here instead
    // of silently emitting corrupt pixels.
    require(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte,
      "resizeBmpHalf: not a BMP payload")
    require(u32le(b, 10) == 54L, s"resizeBmpHalf: unsupported bfOffBits ${u32le(b, 10)} (expected 54)")
    require(u16le(b, 28) == 24, s"resizeBmpHalf: unsupported biBitCount ${u16le(b, 28)} (expected 24)")
    require(s32le(b, 22) > 0, "resizeBmpHalf: top-down (negative biHeight) BMP unsupported")
    val w = s32le(b, 18).toInt; val h = s32le(b, 22).toInt
    val stride = ((w * 3 + 3) / 4) * 4
    val ow = (w + 1) / 2; val oh = (h + 1) / 2
    val ostride = ((ow * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + ostride * oh)
    System.arraycopy(b, 0, out, 0, 54)
    putU32le(out, 2, 54L + ostride * oh)      // bfSize
    putU32le(out, 18, ow.toLong)              // biWidth
    putU32le(out, 22, oh.toLong)              // biHeight
    putU32le(out, 34, (ostride * oh).toLong)  // biSizeImage
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val src = 54 + (2 * y) * stride + (2 * x) * 3
        val dst = 54 + y * ostride + x * 3
        out(dst) = b(src); out(dst + 1) = b(src + 1); out(dst + 2) = b(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** The resize stage of the media pipeline, partition-wise like the
    * decode (the mapInPandas shape: iterator of records per partition,
    * batched into the native kernel). Runs on the BMP third of the
    * corpus; the digest is over the uppercase-hex rendering (the
    * decodeMeta convention — the oracle's digest is VARCHAR-only). */
  def multimodalResize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaPayloads(spark, sfDir)
      .filter(col("doc_id") % 3 === 0)
      .as[MediaRecord]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { r =>
          val b = r.payload
          val o = resizeBmpHalf(b)
          val sb = new java.lang.StringBuilder(o.length * 2)
          var i = 0
          while (i < o.length) { sb.append(String.format("%02X", Integer.valueOf(o(i) & 0xff))); i += 1 }
          digest.reset()
          val sha = digest.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
            .map("%02x".format(_)).mkString
          ResizedMedia(r.doc_id, s32le(b, 18), s32le(b, 22),
            s32le(o, 18), s32le(o, 22), o.length.toLong, sha)
        }
      }.toDF()
  }

  /** Audio record after 2× decimation: geometry + full-file digest
    * (the multimodalResize convention). */
  case class ResampledAudio(doc_id: Long, in_rate: Long, out_rate: Long,
      in_frames: Long, out_frames: Long, out_len: Long, out_sha256: String)

  /** REAL 2× decimation of a PCM WAV payload: read the format fields
    * from the header, keep every 2nd sample FRAME (all channels of a
    * frame move together), emit a VALID WAV at half the sample rate —
    * patched RIFF size, sample rate, byte rate, and data-chunk size.
    * Nearest-neighbor in time, the audio analog of resizeBmpHalf. */
  def resampleWavHalf(b: Array[Byte]): Array[Byte] = {
    // canonical 44-byte PCM WAV only: RIFF/WAVE magic, fmt chunk at 12,
    // the data chunk id at 36. A WAV with extra chunks before 'data'
    // (LIST/INFO etc.) must fail loudly, not be decimated mid-chunk.
    require(b.length >= 44 &&
      b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte && b(3) == 'F'.toByte &&
      b(8) == 'W'.toByte && b(9) == 'A'.toByte && b(10) == 'V'.toByte && b(11) == 'E'.toByte,
      "resampleWavHalf: not a RIFF/WAVE payload")
    require(u16le(b, 20) == 1, s"resampleWavHalf: non-PCM format ${u16le(b, 20)}")
    require(b(36) == 'd'.toByte && b(37) == 'a'.toByte &&
      b(38) == 't'.toByte && b(39) == 'a'.toByte,
      "resampleWavHalf: data chunk not at offset 36 (extra chunks unsupported)")
    val ch = u16le(b, 22)
    val sr = u32le(b, 24)
    val ba = u16le(b, 32)            // block align = bytes per frame
    val dataLen = u32le(b, 40).toInt
    val nFrames = dataLen / ba
    val outFrames = (nFrames + 1) / 2
    val outData = outFrames * ba
    val out = new Array[Byte](44 + outData)
    System.arraycopy(b, 0, out, 0, 44)
    putU32le(out, 4, 36L + outData)        // RIFF chunk size
    putU32le(out, 24, sr / 2)              // sample rate
    putU32le(out, 28, (sr / 2) * ch * (u16le(b, 34) / 8)) // byte rate
    putU32le(out, 40, outData.toLong)      // data chunk size
    var f = 0
    while (f < outFrames) {
      System.arraycopy(b, 44 + (2 * f) * ba, out, 44 + f * ba, ba)
      f += 1
    }
    out
  }

  /** The audio-resample stage, partition-wise on the WAV third of the
    * corpus (doc_id % 3 == 1). Digest over the uppercase-hex rendering
    * like every media gate row. */
  def multimodalAudioResample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    mediaPayloads(spark, sfDir)
      .filter(col("doc_id") % 3 === 1)
      .as[MediaRecord]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { r =>
          val b = r.payload
          val o = resampleWavHalf(b)
          val sb = new java.lang.StringBuilder(o.length * 2)
          var i = 0
          while (i < o.length) { sb.append(String.format("%02X", Integer.valueOf(o(i) & 0xff))); i += 1 }
          digest.reset()
          val sha = digest.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
            .map("%02x".format(_)).mkString
          val ba = u16le(b, 32)
          ResampledAudio(r.doc_id, u32le(b, 24), u32le(o, 24),
            u32le(b, 40) / ba, u32le(o, 40) / ba, o.length.toLong, sha)
        }
      }.toDF()
  }

  /** DuckDB oracle for multimodalAudioResample: regenerates the source
    * WAV hex, rebuilds the decimated file hex (patched sizes + every
    * kept frame) in SQL, digests it. */
  val audioResampleOracleSql: String = {
    val n = wavN; val ba = wavBa; val sr = wavSr; val ch = wavCh
    val outN = s"((($n) + 1) // 2)"
    val outData = s"(($outN) * ($ba))"
    s"""WITH b AS (SELECT doc_id, $wavHex AS src, $sr AS sr, $n AS nf FROM documents
       |  WHERE doc_id % 3 = 1),
       |d AS (SELECT doc_id, sr, nf,
       |    array_to_string(list_transform(range($outN), f ->
       |      substr(src, 2*(44 + (2*f)*($ba)) + 1, 2*($ba))), '') AS datahex
       |  FROM b),
       |f AS (SELECT doc_id, sr, nf,
       |    '52494646' || ${u32hex(s"$outData + 36")} || '57415645' || '666D7420' ||
       |    '10000000' || '0100' || ${u16hex(ch)} || ${u32hex(s"($sr) // 2")} ||
       |    ${u32hex(s"(($sr) // 2) * ($ba)")} || ${u16hex(ba)} || '1000' ||
       |    '64617461' || ${u32hex(outData)} || datahex AS filehex
       |  FROM d)
       |SELECT doc_id, CAST(sr AS BIGINT) AS in_rate, CAST(sr // 2 AS BIGINT) AS out_rate,
       |  CAST(nf AS BIGINT) AS in_frames, CAST(($outN) AS BIGINT) AS out_frames,
       |  CAST(length(filehex) // 2 AS BIGINT) AS out_len,
       |  sha256(filehex) AS out_sha256
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** DuckDB oracle for multimodalResize: regenerates the source BMP
    * hex (the shared generator), then rebuilds the RESIZED file hex —
    * header constants, patched size fields, every sampled pixel, row
    * padding — entirely in SQL, and digests it. Any divergence in the
    * resize rule fails the hash compare. */
  val resizeOracleSql: String = {
    val w = bmpW; val h = bmpH
    val stride = s"((($w)*3 + 3) // 4 * 4)"
    val ow = s"((($w) + 1) // 2)"; val oh = s"((($h) + 1) // 2)"
    val ostride = s"((($ow)*3 + 3) // 4 * 4)"
    val opx = s"(($ostride) * ($oh))"
    // one output row y: ow sampled pixels (6 hex chars each) + padding
    val rowHex =
      s"""concat(array_to_string(list_transform(range($ow), x ->
         |    substr(src, 2*(54 + (2*y)*($stride) + (2*x)*3) + 1, 6)), ''),
         |  repeat('00', ($ostride) - ($ow)*3))""".stripMargin
    s"""WITH b AS (SELECT doc_id, $bmpHex AS src, $w AS w, $h AS h FROM documents
       |  WHERE doc_id % 3 = 0),
       |d AS (SELECT doc_id, w, h,
       |    array_to_string(list_transform(range($oh), y -> $rowHex), '') AS datahex
       |  FROM b),
       |f AS (SELECT doc_id, w, h,
       |    '424D' || ${u32hex(s"$opx + 54")} || '00000000' || '36000000' || '28000000' ||
       |    ${u32hex(ow)} || ${u32hex(oh)} || '0100' || '1800' || '00000000' ||
       |    ${u32hex(opx)} || '130B0000' || '130B0000' || '00000000' || '00000000' || datahex AS filehex
       |  FROM d)
       |SELECT doc_id, CAST(w AS BIGINT) AS in_w, CAST(h AS BIGINT) AS in_h,
       |  CAST(($ow) AS BIGINT) AS out_w, CAST(($oh) AS BIGINT) AS out_h,
       |  CAST(length(filehex) // 2 AS BIGINT) AS out_len,
       |  sha256(filehex) AS out_sha256
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** FRAME-FINGERPRINT DEDUP — the media analog of shingle dedup:
    * whole-file hashes never collide here (every container embeds
    * doc-derived dims), so duplication lives at the CONTENT level —
    * the sampled frame fingerprints multimodalFeatures already
    * extracts. Shared fingerprints across assets are recycled footage
    * / repeated stills; a video pipeline dedupes exactly this way
    * (per-frame perceptual hashes, bucket-joined). Reported per
    * format: total and distinct sampled frames, duplicate-frame
    * volume, the hottest frame's copy count, and how many fingerprints
    * appear in ≥2 distinct assets.
    *
    * The frame stream is the exact multimodalFeatures sampling
    * (FrameBytes=16, FrameStride=4 — one fingerprint per 64 content
    * bytes), so the two gate rows describe the same fingerprints.
    * Scale shape: one row-local explode (1/64th of content volume),
    * one hash-keyed count aggregate (map-side combined), one
    * |formats|-row fold — the shuffle moves 61-bit hashes, never
    * content. */
  def multimodalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val frames = graft.operators.Partitioning.spread(
        Tables.documents(spark, sfDir))
      // frames exist only past one full FrameBytes window (the oracle's
      // empty range(0, 0)); the filter also dodges Spark's descending
      // sequence(0, -1) surprise
      .filter(length(col("text")) >= FrameBytes)
      .select(col("doc_id"),
        expr("CASE WHEN doc_id % 3 = 0 THEN 'bmp' WHEN doc_id % 3 = 1 THEN 'wav' ELSE 'png' END")
          .as("format"),
        explode(expr(
          s"""transform(sequence(0, (length(text) div $FrameBytes + ${FrameStride - 1}) div $FrameStride - 1),
             | s -> md5_mod61(substring(text, cast(s * ${FrameBytes * FrameStride} + 1 as int), $FrameBytes)))"""
            .stripMargin)).as("fh"))
    val g = frames.groupBy(col("format"), col("fh"))
      .agg(count(lit(1)).as("copies"), count_distinct(col("doc_id")).as("nd"))
    g.groupBy(col("format"))
      .agg(sum(col("copies")).as("n_frames"),
        count(lit(1)).as("n_distinct_frames"),
        sum(col("copies") - 1).as("n_dup_frames"),
        max(col("copies")).as("max_frame_copies"),
        sum(when(col("nd") >= 2L, 1L).otherwise(0L)).as("n_shared_across_docs"))
      .select(col("format"), col("n_frames"), col("n_distinct_frames"),
        col("n_dup_frames"),
        when(col("n_frames") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_dup_frames").cast("double")
            / col("n_frames").cast("double"), 6)).as("dup_rate"),
        col("max_frame_copies"), col("n_shared_across_docs"))
  }

  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
      .mapPartitions(_.map(byteFeatures))
      .toDF()
  }
}
