package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Decoded-media metadata row (the output schema of the decode stage). */
final case class MediaMeta(
    doc_id: Long, byte_len: Long, width: Int, height: Int, format: String)

/** One sampled frame: byte offset + length of the frame window. */
final case class MediaFrame(
    doc_id: Long, frame_idx: Int, frame_off: Long, frame_len: Int)

/** Decoded audio metadata (WAV/RIFF header parse). */
final case class AudioMeta(
    doc_id: Long, sample_rate: Int, channels: Int, bits: Int, n_samples: Long)

/** PCM feature-extraction output: exact integer signal statistics
  * (sum-of-squares energy and peak amplitude) decoded from the samples
  * themselves, not the header.
  */
final case class AudioStats(
    doc_id: Long, n_samples: Long, sum_sq: Long, peak: Int)

/** One real frame parsed from a GIF container: byte offset of the image
  * descriptor plus the frame's own dimensions.
  */
final case class GifFrame(
    doc_id: Long, frame_idx: Int, frame_off: Long, width: Int, height: Int)

/** TIFF IFD metadata: dimensions plus the container's byte order — the
  * one mainstream image format whose header is endianness-switched.
  */
final case class TiffMeta(
    doc_id: Long, width: Int, height: Int, big_endian: Boolean, n_entries: Int)

/** One animated-GIF frame with its Graphic-Control-Extension timing. */
final case class GifFrameTiming(
    doc_id: Long, frame_idx: Int, delay_cs: Int, width: Int, height: Int)

/** One MPEG-1 Layer III frame decoded from its header bit fields. */
final case class Mp3Frame(
    doc_id: Long, frame_idx: Int, bitrate_kbps: Int, sample_rate: Int, frame_len: Int)

/** JPEG SOF dimensions + EXIF orientation (APP1-embedded TIFF IFD0). */
final case class ExifMeta(
    doc_id: Long, width: Int, height: Int, orientation: Int, tiff_big_endian: Boolean)

/** BMP header metadata; `top_down` decodes the negative-biHeight form. */
final case class BmpMeta(
    doc_id: Long, width: Int, height: Int, top_down: Boolean, bpp: Int)

/** MP4/ISO-BMFF movie-header metadata: global timescale, duration in
  * that timescale, and the number of track boxes.
  */
final case class Mp4Meta(
    doc_id: Long, timescale: Int, duration: Long, n_trak: Int)

/** Fully-decoded image facts (real codec, not header inspection):
  * dimensions plus two pixel probes proving the raster was decompressed.
  */
final case class ImagePixels(
    doc_id: Long, width: Int, height: Int, px00: Int, px_mean: Int)

/** Decode→resize output: new dimensions plus two probes into the
  * resampled raster.
  */
final case class ResizedImage(
    doc_id: Long, out_w: Int, out_h: Int, px_last: Int, px_mid: Int)

/** Multimodal-column plumbing (north-star surface): media travels as an
  * opaque `binary` column with typed metadata alongside.
  *
  * Every decode here is a REAL byte-level parse (PNG/JPEG/GIF/WAV/MP3/
  * MP4/TIFF/EXIF/BMP headers plus JDK raster decode where a codec
  * exists in the JRE); unrecognized bytes surface as format `unknown`,
  * never as fabricated metadata. At scale the binary column is the
  * widest thing in the table, so the plumbing:
  *  - prunes to (id, media) BEFORE the decode stage (never carries other
  *    columns through the non-codegen boundary);
  *  - processes per-partition with an iterator (no per-row lambda setup,
  *    no collect), the same shape a JNI/codec batch decode needs.
  */
object Multimodal {

  /** REAL header decode for the formats whose dimensions are parseable
    * with zero codec dependencies (pure byte inspection): PNG (IHDR),
    * JPEG (SOF0/1/2 scan), GIF (logical screen descriptor). Returns None
    * for anything else — [[decodeMetadata]] reports those as `unknown`.
    */
  def headerDecode(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    def be32(i: Int): Int =
      ((bytes(i) & 0xFF) << 24) | ((bytes(i + 1) & 0xFF) << 16) |
        ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
    def be16(i: Int): Int = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
    def le16(i: Int): Int = (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8)

    if (bytes.length >= 24 &&
        bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G' &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
      Some((be32(16), be32(20), "png"))
    } else if (bytes.length >= 4 &&
        bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) {
      // JPEG: walk the segment chain to the first frame header (SOFn,
      // n ∉ {4, 8, 12} which are DHT/JPG/DAC, not frames)
      var i = 2
      var res: Option[(Int, Int, String)] = None
      while (res.isEmpty && i + 9 < bytes.length && bytes(i) == 0xFF.toByte) {
        if (bytes(i + 1) == 0xFF.toByte) {
          i += 1 // 0xFF fill bytes before a marker are legal padding
        } else {
          val marker = bytes(i + 1) & 0xFF
          if (marker >= 0xC0 && marker <= 0xCF &&
              marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
            res = Some((be16(i + 7), be16(i + 5), "jpeg")) // (width, height)
          } else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) {
            i += 2 // standalone marker (TEM/RSTn/SOI/EOI), no length field
          } else {
            i += 2 + be16(i + 2)
          }
        }
      }
      res
    } else if (bytes.length >= 10 && isGif(bytes)) {
      Some((le16(6), le16(8), "gif"))
    } else None
  }

  /** Full 6-byte GIF signature (GIF87a / GIF89a). Checking only "GIF8"
    * would let text bytes that happen to start with those ASCII chars
    * be misreported as a parsed GIF.
    */
  private def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** REAL WAV (RIFF) header parse — pure byte inspection, no codec: walks
    * the chunk chain for `fmt ` (rate/channels/bits) and `data` (sample
    * count = chunk size / block align). Returns None for non-WAV bytes.
    */
  def wavHeaderDecode(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def le16(i: Int): Int = (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8)
    def le32(i: Int): Long =
      (bytes(i) & 0xFFL) | ((bytes(i + 1) & 0xFFL) << 8) |
        ((bytes(i + 2) & 0xFFL) << 16) | ((bytes(i + 3) & 0xFFL) << 24)
    def tag(i: Int, s: String): Boolean =
      (0 until 4).forall(j => bytes(i + j) == s.charAt(j).toByte)

    if (bytes.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // (rate, channels, bits, blockAlign)
    var dataSize = -1L
    while (i + 8 <= bytes.length && (fmt.isEmpty || dataSize < 0)) {
      val ii = i.toInt
      val size = le32(ii + 4) // unsigned — keep as Long so a corrupt/huge
      if (tag(ii, "fmt ") && ii + 24 <= bytes.length) { // size can't drive i
        fmt = Some((le32(ii + 12).toInt, le16(ii + 10), le16(ii + 22), le16(ii + 20)))
      } else if (tag(ii, "data")) { // backwards (infinite loop) or negative
        dataSize = size // (index crash) — the walk just runs off the end
      }
      i += 8L + size + (size & 1L) // chunks are word-aligned
    }
    fmt.collect { case (rate, ch, bits, ba) if dataSize >= 0 && ba > 0 =>
      (rate, ch, bits, dataSize / ba)
    }
  }

  /** Decode a (id, audio) pair stream into typed audio metadata via
    * [[wavHeaderDecode]]; unparseable rows are dropped (a real pipeline
    * routes them to a quarantine sink). Same pruned-input/mapPartitions
    * discipline as [[decodeMetadata]].
    */
  def decodeAudioMetadata(spark: SparkSession, pruned: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        wavHeaderDecode(bytes).map { case (rate, ch, bits, n) =>
          AudioMeta(id, rate, ch, bits, n)
        }
      }
    }
  }

  /** Minimal well-formed PCM WAV file with the given shape — a
    * test/oracle fixture for [[wavHeaderDecode]]. The data chunk carries
    * real (zeroed) payload bytes so the declared sizes are honest.
    */
  def wavFixture(rate: Int, channels: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = nSamples * blockAlign
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(bits.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    out.array()
  }

  /** PCM WAV fixture whose 16-bit mono samples follow the integer
    * formula `v(i) = ((seed*31 + i*7919) mod 4096) - 2048` — deterministic
    * and replayable in plain SQL, so PCM-level feature extraction gets an
    * exact cross-engine oracle (no codec, no floats).
    */
  def wavFixtureTone(rate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val dataSize = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(1.toShort).putInt(rate)
      .putInt(rate * 2).putShort(2.toShort).putShort(16.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      out.putShort((((seed * 31 + i.toLong * 7919) % 4096) - 2048).toShort)
      i += 1
    }
    out.array()
  }

  /** REAL PCM sample decode (16-bit LE mono/interleaved): walks to the
    * `data` chunk and folds every sample into exact integer statistics —
    * count, sum of squares (energy), peak |amplitude|. All-integer math
    * keeps the result bit-identical across engines and partitionings.
    * Returns None for non-WAV or non-16-bit input.
    */
  def wavPcmStats(bytes: Array[Byte]): Option[(Long, Long, Int)] = {
    wavHeaderDecode(bytes).filter(_._3 == 16).flatMap { _ =>
      def tag(i: Int, s: String): Boolean =
        (0 until 4).forall(j => bytes(i + j) == s.charAt(j).toByte)
      def le32(i: Int): Long =
        (bytes(i) & 0xFFL) | ((bytes(i + 1) & 0xFFL) << 8) |
          ((bytes(i + 2) & 0xFFL) << 16) | ((bytes(i + 3) & 0xFFL) << 24)
      var i = 12L
      var res: Option[(Long, Long, Int)] = None
      while (res.isEmpty && i + 8 <= bytes.length) {
        val ii = i.toInt
        val size = le32(ii + 4)
        if (tag(ii, "data")) {
          val end = math.min(ii + 8 + size, bytes.length.toLong).toInt
          var p = ii + 8
          var n = 0L; var sq = 0L; var peak = 0
          while (p + 1 < end) {
            val v = ((bytes(p) & 0xFF) | (bytes(p + 1) << 8)).toShort.toInt
            n += 1; sq += v.toLong * v; if (math.abs(v) > peak) peak = math.abs(v)
            p += 2
          }
          res = Some((n, sq, peak))
        }
        i += 8L + size + (size & 1L)
      }
      res
    }
  }

  /** Decode a (id, audio) pair stream into exact PCM statistics via
    * [[wavPcmStats]] — the audio twin of the image pixel-decode stage:
    * prune to (id, bytes) BEFORE the non-codegen boundary, one pass per
    * partition, unparseable rows dropped.
    */
  def decodeAudioStats(spark: SparkSession, pruned: DataFrame): Dataset[AudioStats] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        wavPcmStats(bytes).map { case (n, sq, peak) => AudioStats(id, n, sq, peak) }
      }
    }
  }

  /** Decode a (id, media) pair stream into typed metadata: real header
    * parse where the format is recognized; unrecognized bytes are
    * reported honestly as `(0, 0, "unknown")` — a pipeline can filter or
    * route them, but the engine never fabricates dimensions. Input must
    * be pre-pruned to exactly (id: bigint, media: binary).
    */
  def decodeMetadata(spark: SparkSession, pruned: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (w, h, fmt) = headerDecode(bytes).getOrElse((0, 0, "unknown"))
        MediaMeta(id, bytes.length.toLong, w, h, fmt)
      }
    }
  }

  /** REAL TIFF IFD walk, byte-order aware: reads the II/MM magic, follows
    * the IFD offset, iterates the 12-byte directory entries, and pulls
    * ImageWidth (256) / ImageLength (257) — each of which may be stored
    * as SHORT (type 3) or LONG (type 4), left-justified in the value
    * field per the spec (so a SHORT in a big-endian file sits in the
    * FIRST two value bytes, not the last two — the classic TIFF parser
    * bug). Returns (width, height, bigEndian, entryCount).
    */
  def tiffHeaderDecode(bytes: Array[Byte]): Option[(Int, Int, Boolean, Int)] = {
    if (bytes.length < 8) return None
    val big =
      if (bytes(0) == 'M' && bytes(1) == 'M') true
      else if (bytes(0) == 'I' && bytes(1) == 'I') false
      else return None
    def u16(i: Int): Int =
      if (big) ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
      else (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8)
    def u32(i: Int): Long =
      if (big) (u16(i).toLong << 16) | u16(i + 2)
      else (u16(i + 2).toLong << 16) | u16(i)
    if (u16(2) != 42) return None
    val ifd = u32(4).toInt
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = u16(ifd)
    if (ifd + 2 + n * 12 > bytes.length) return None
    var w = -1; var h = -1
    var k = 0
    while (k < n) {
      val e = ifd + 2 + k * 12
      val tag = u16(e)
      if (tag == 256 || tag == 257) {
        val typ = u16(e + 2)
        val v =
          if (typ == 3) u16(e + 8) // SHORT: left-justified in the value slot
          else u32(e + 8).toInt // LONG
        if (tag == 256) w = v else h = v
      }
      k += 1
    }
    if (w < 0 || h < 0) None else Some((w, h, big, n))
  }

  /** Byte-order-aware TIFF IFD tag scan: all count-1 SHORT/LONG entries
    * of IFD0 as (tag → value), plus the byte order. The generic walk
    * behind [[tiffHeaderDecode]] (dims) and [[exifOrientation]]
    * (orientation tag 274 inside a JPEG APP1 Exif payload).
    */
  def tiffTags(bytes: Array[Byte]): Option[(Boolean, Map[Int, Int])] = {
    if (bytes.length < 8) return None
    val big =
      if (bytes(0) == 'M' && bytes(1) == 'M') true
      else if (bytes(0) == 'I' && bytes(1) == 'I') false
      else return None
    def u16(i: Int): Int =
      if (big) ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
      else (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8)
    def u32(i: Int): Long =
      if (big) (u16(i).toLong << 16) | u16(i + 2)
      else (u16(i + 2).toLong << 16) | u16(i)
    if (u16(2) != 42) return None
    val ifd = u32(4).toInt
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = u16(ifd)
    if (ifd + 2 + n * 12 > bytes.length) return None
    val tags = Map.newBuilder[Int, Int]
    var k = 0
    while (k < n) {
      val e = ifd + 2 + k * 12
      val typ = u16(e + 2)
      if (u32(e + 4) == 1L && (typ == 3 || typ == 4))
        // SHORT values are LEFT-justified in the 4-byte slot, LONG fills it
        tags += u16(e) -> (if (typ == 3) u16(e + 8) else u32(e + 8).toInt)
      k += 1
    }
    Some((big, tags.result()))
  }

  /** JPEG fixture with a REAL APP1 Exif segment: SOI, APP1 ("Exif\0\0" +
    * an embedded TIFF whose IFD carries Orientation tag 274), then SOF0
    * with the pixel dimensions. `littleEndian` picks the embedded TIFF's
    * byte order (both occur in the wild; the parser must honor it).
    */
  def exifFixture(
      width: Int, height: Int, orientation: Int, littleEndian: Boolean): Array[Byte] = {
    val tiff = java.nio.ByteBuffer.allocate(8 + 2 + 12 + 4)
    if (littleEndian) {
      tiff.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      tiff.put('I'.toByte).put('I'.toByte)
    } else tiff.put('M'.toByte).put('M'.toByte)
    tiff.putShort(42.toShort).putInt(8)
    tiff.putShort(1.toShort) // one IFD entry
    tiff.putShort(274.toShort).putShort(3.toShort).putInt(1)
      .putShort(orientation.toShort).putShort(0.toShort) // SHORT, left-justified
    tiff.putInt(0)
    val t = tiff.array()
    val out = java.nio.ByteBuffer.allocate(2 + 4 + 6 + t.length + 12 + 2)
    out.put(Array(0xFF, 0xD8).map(_.toByte)) // SOI
    out.put(Array(0xFF, 0xE1).map(_.toByte))
      .putShort((2 + 6 + t.length).toShort)
      .put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
      .put(t)
    out.put(Array(0xFF, 0xC0).map(_.toByte)).putShort(8.toShort)
      .put(8.toByte).putShort(height.toShort).putShort(width.toShort).put(1.toByte)
    out.put(Array(0xFF, 0xD9).map(_.toByte)) // EOI
    out.array()
  }

  /** EXIF orientation + SOF dimensions from a real JPEG marker walk:
    * segments are length-prefixed (the length covers itself, not the
    * marker), APP1 payloads starting "Exif\0\0" embed a TIFF whose IFD0
    * tag 274 is the orientation. Returns (width, height, orientation,
    * tiff_big_endian); None for non-JPEG bytes or JPEGs without both an
    * Exif orientation and an SOF frame header.
    */
  def exifOrientation(bytes: Array[Byte]): Option[(Int, Int, Int, Boolean)] = {
    if (bytes.length < 4 || (bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8)
      return None
    def u16(i: Int): Int = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
    var i = 2
    var w = -1; var h = -1; var orient = -1; var big = false
    while (i + 4 <= bytes.length) {
      if ((bytes(i) & 0xFF) != 0xFF) return None
      val marker = bytes(i + 1) & 0xFF
      if (marker == 0xD9 || marker == 0xDA) { // EOI / SOS: metadata is over
        i = bytes.length
      } else {
        val len = u16(i + 2) // includes the 2 length bytes
        if (len < 2 || i + 2 + len > bytes.length) return None
        if (marker == 0xE1 && len >= 8 + 6 &&
            bytes.slice(i + 4, i + 10).sameElements(
              Array[Byte]('E', 'x', 'i', 'f', 0, 0))) {
          tiffTags(bytes.slice(i + 10, i + 2 + len)).foreach { case (b, tags) =>
            tags.get(274).foreach { o => orient = o; big = b }
          }
        } else if (marker >= 0xC0 && marker <= 0xC3 && len >= 7) {
          h = u16(i + 5); w = u16(i + 7)
        }
        i += 2 + len
      }
    }
    if (w < 0 || orient < 0) None else Some((w, h, orient, big))
  }

  private val mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val mp3Rates = Array(44100, 48000, 32000)

  /** MPEG-1 Layer III fixture: consecutive frames, frame k with bitrate
    * index `brIdxs(k)` (1–14), samplerate index `srIdx` (0–2), padding
    * bit `pads(k)`; each frame is its 4-byte header + zero audio data to
    * the spec frame length 144·bitrate/samplerate + padding.
    */
  def mp3Fixture(brIdxs: Seq[Int], srIdx: Int, pads: Seq[Int]): Array[Byte] = {
    require(brIdxs.length == pads.length)
    brIdxs.indices.flatMap { k =>
      val len = 144 * (mp3Bitrates(brIdxs(k)) * 1000) / mp3Rates(srIdx) + pads(k)
      val b = new Array[Byte](len)
      b(0) = 0xFF.toByte
      b(1) = 0xFB.toByte // sync + MPEG-1 + Layer III + no CRC
      b(2) = ((brIdxs(k) << 4) | (srIdx << 2) | (pads(k) << 1)).toByte
      b
    }.toArray
  }

  /** REAL MP3 frame walk: validates each sync word, decodes version /
    * layer / bitrate-index / samplerate-index / padding from the header
    * bit fields, advances by the computed frame length. Emits
    * (frame_idx, bitrate_kbps, sample_rate, frame_len); stops at the
    * first non-frame byte (MPEG-1 Layer III only — the fixture's shape).
    */
  def mp3Frames(bytes: Array[Byte]): Seq[(Int, Int, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
    var i = 0
    var idx = 0
    while (i + 4 <= bytes.length) {
      val b1 = bytes(i) & 0xFF; val b2 = bytes(i + 1) & 0xFF; val b3 = bytes(i + 2) & 0xFF
      if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) return out.toSeq
      val version = (b2 >> 3) & 0x3
      val layer = (b2 >> 1) & 0x3
      if (version != 3 || layer != 1) return out.toSeq // MPEG-1 Layer III
      val brIdx = b3 >> 4
      val srIdx = (b3 >> 2) & 0x3
      val pad = (b3 >> 1) & 0x1
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return out.toSeq
      val kbps = mp3Bitrates(brIdx)
      val rate = mp3Rates(srIdx)
      val len = 144 * (kbps * 1000) / rate + pad
      out += ((idx, kbps, rate, len))
      idx += 1
      i += len
    }
    out.toSeq
  }

  /** Minimal BMP (BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER) fixture;
    * a negative biHeight encodes a top-down raster, per the spec.
    */
  def bmpFixture(width: Int, height: Int, topDown: Boolean, bpp: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54)
      .putShort(0.toShort).putShort(0.toShort).putInt(54)
    out.putInt(40).putInt(width).putInt(if (topDown) -height else height)
    out.putShort(1.toShort).putShort(bpp.toShort).putInt(0).putInt(0)
    out.putInt(2835).putInt(2835).putInt(0).putInt(0)
    out.array()
  }

  /** REAL BMP header decode: (width, height, top_down, bpp). biHeight is
    * SIGNED little-endian — negative means top-down row order (the
    * classic BMP parser bug is reporting the raw negative height).
    */
  def bmpHeaderDecode(bytes: Array[Byte]): Option[(Int, Int, Boolean, Int)] = {
    if (bytes.length < 30 || bytes(0) != 'B' || bytes(1) != 'M') return None
    def i32(i: Int): Int =
      (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8) |
        ((bytes(i + 2) & 0xFF) << 16) | ((bytes(i + 3) & 0xFF) << 24)
    def u16(i: Int): Int = (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8)
    if (i32(14) < 40) return None // BITMAPCOREHEADER etc. out of scope
    val w = i32(18); val h = i32(22); val bpp = u16(28)
    if (w <= 0 || h == 0 || h == Int.MinValue) return None
    Some((w, math.abs(h), h < 0, bpp))
  }

  def decodeBmpMeta(spark: SparkSession, pruned: DataFrame): Dataset[BmpMeta] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        bmpHeaderDecode(bytes).map { case (w, h, td, bpp) =>
          BmpMeta(id, w, h, td, bpp)
        }
      }
    }
  }

  /** Real TIFF via the JDK's ImageIO TIFF writer (emits big-endian MM). */
  def tiffFixture(width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "tiff", out)
    out.toByteArray
  }

  /** Hand-built minimal LITTLE-ENDIAN (II) TIFF header + IFD with
    * SHORT-typed dimension entries — exercises the byte-order and
    * value-justification paths the ImageIO (MM) fixture does not.
    */
  def tiffFixtureLE(width: Int, height: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + 2 + 2 * 12 + 4)
    buf.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42.toShort).putInt(8)
    buf.putShort(2.toShort) // entry count
    // tag 256 ImageWidth, SHORT, count 1, value left-justified
    buf.putShort(256.toShort).putShort(3.toShort).putInt(1)
      .putShort(width.toShort).putShort(0.toShort)
    buf.putShort(257.toShort).putShort(3.toShort).putInt(1)
      .putShort(height.toShort).putShort(0.toShort)
    buf.putInt(0) // next-IFD terminator
    buf.array()
  }

  def decodeTiffMeta(spark: SparkSession, pruned: DataFrame): Dataset[TiffMeta] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        tiffHeaderDecode(bytes).map { case (w, h, big, n) =>
          TiffMeta(id, w, h, big, n)
        }
      }
    }
  }

  /** Minimal well-formed PNG prefix (signature + IHDR) with the given
    * dimensions — a test/oracle fixture for [[headerDecode]].
    */
  def pngFixture(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(width).putInt(height)
    out.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.putInt(0) // CRC placeholder — header parsers don't verify it
    out.array()
  }

  /** Minimal JPEG prefix (SOI + APP0 + SOF0) with the given dimensions. */
  def jpegFixture(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(2 + 18 + 12)
    out.put(Array(0xFF, 0xD8).map(_.toByte))
    out.put(Array(0xFF, 0xE0).map(_.toByte)).putShort(16.toShort)
      .put("JFIF ".getBytes("US-ASCII")).put(new Array[Byte](9))
    out.put(Array(0xFF, 0xC0).map(_.toByte)).putShort(8.toShort)
      .put(8.toByte).putShort(height.toShort).putShort(width.toShort).put(1.toByte)
    out.array()
  }

  /** REAL GIF frame walk — the honest version of frame sampling for the
    * one container format parseable without codecs: skips the logical
    * screen descriptor + global color table, then walks the block chain
    * (0x21 extensions with length-prefixed sub-blocks, 0x2C image
    * descriptors with optional local color tables + LZW data) and emits
    * one (offset, width, height) per image descriptor. Returns Nil for
    * non-GIF bytes.
    */
  def gifFrames(bytes: Array[Byte]): Seq[(Long, Int, Int)] = {
    def le16(i: Int): Int = (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8)
    if (bytes.length < 13 || !isGif(bytes)) return Nil
    val gctFlag = (bytes(10) & 0x80) != 0
    val gctSize = if (gctFlag) 3 * (1 << ((bytes(10) & 0x07) + 1)) else 0
    var i = 13 + gctSize
    val out = Seq.newBuilder[(Long, Int, Int)]
    def skipSubBlocks(): Unit = {
      while (i < bytes.length && bytes(i) != 0) i += 1 + (bytes(i) & 0xFF)
      i += 1 // block terminator
    }
    var done = false
    while (!done && i < bytes.length) {
      (bytes(i) & 0xFF) match {
        case 0x2C if i + 10 <= bytes.length => // image descriptor
          out += ((i.toLong, le16(i + 5), le16(i + 7)))
          val lctFlag = (bytes(i + 9) & 0x80) != 0
          val lctSize = if (lctFlag) 3 * (1 << ((bytes(i + 9) & 0x07) + 1)) else 0
          i += 10 + lctSize + 1 // descriptor + local table + LZW min code size
          skipSubBlocks()
        case 0x21 if i + 2 <= bytes.length => // extension: label + sub-blocks
          i += 2
          skipSubBlocks()
        case 0x3B => done = true // trailer
        case _    => done = true // malformed — stop, keep what we have
      }
    }
    out.result()
  }

  /** REAL MP4 (ISO-BMFF) box walk — pure byte inspection of the fourth
    * codec-less container format: top-level boxes are `[size:BE32][type:
    * 4 ASCII]`; `moov`'s children include one `mvhd` (movie header:
    * version byte selects 32- vs 64-bit create/modify/duration fields)
    * and one `trak` per track. Returns (timescale, duration, n_trak);
    * None for non-BMFF bytes or a missing/truncated mvhd. Defensive like
    * the RIFF walker: sizes ride a Long cursor, a size < 8 (malformed —
    * would loop) aborts the walk.
    */
  def mp4Metadata(bytes: Array[Byte]): Option[(Int, Long, Int)] = {
    def be32(i: Int): Long =
      ((bytes(i) & 0xFFL) << 24) | ((bytes(i + 1) & 0xFFL) << 16) |
        ((bytes(i + 2) & 0xFFL) << 8) | (bytes(i + 3) & 0xFFL)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def typ(i: Int): String =
      new String(bytes, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // a real brand check: the first box must be ftyp (per ISO 14496-12 the
    // file type box comes first) — random bytes never pass
    if (bytes.length < 16 || typ(0) != "ftyp") return None
    var i = 0L
    var res: Option[(Int, Long, Int)] = None
    while (res.isEmpty && i + 8 <= bytes.length) {
      val ii = i.toInt
      val rawSize = be32(ii)
      val size = if (rawSize == 1 && ii + 16 <= bytes.length) be64(ii + 8)
        else if (rawSize == 0) bytes.length - i
        else rawSize
      if (size < 8) return res // malformed — never advance by < 8
      if (typ(ii) == "moov") {
        // walk moov's children within [ii+8, ii+size)
        var j = i + 8
        val end = math.min(i + size, bytes.length.toLong)
        var timescale = -1
        var duration = -1L
        var nTrak = 0
        while (j + 8 <= end) {
          val jj = j.toInt
          val csize = be32(jj)
          if (csize < 8) return res
          typ(jj) match {
            case "mvhd" if jj + 12 <= bytes.length =>
              val v1 = bytes(jj + 8) == 1
              if (v1 && jj + 40 <= bytes.length) {
                timescale = be32(jj + 28).toInt; duration = be64(jj + 32)
              } else if (!v1 && jj + 32 <= bytes.length) {
                timescale = be32(jj + 20).toInt; duration = be32(jj + 24)
              }
            case "trak" => nTrak += 1
            case _ => ()
          }
          j += csize
        }
        if (timescale > 0) res = Some((timescale, duration, nTrak))
      }
      i += size
    }
    res
  }

  /** Decode a (id, mp4) pair stream into movie metadata via
    * [[mp4Metadata]]; non-BMFF rows are dropped. Same pruned-input /
    * mapPartitions discipline as the other decode stages.
    */
  def decodeMp4Metadata(spark: SparkSession, pruned: DataFrame): Dataset[Mp4Meta] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        mp4Metadata(bytes).map { case (ts, dur, n) => Mp4Meta(id, ts, dur, n) }
      }
    }
  }

  /** Minimal well-formed BMFF file: ftyp + moov(mvhd v0 + `nTrak` empty
    * trak boxes) — a test/oracle fixture for [[mp4Metadata]].
    */
  def mp4Fixture(timescale: Int, duration: Int, nTrak: Int): Array[Byte] = {
    val moovSize = 8 + 108 + 8 * nTrak
    val out = java.nio.ByteBuffer.allocate(16 + moovSize)
    out.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    out.putInt(moovSize).put("moov".getBytes("US-ASCII"))
    out.putInt(108).put("mvhd".getBytes("US-ASCII"))
    out.putInt(0) // version 0 + flags
    out.putInt(0).putInt(0) // creation/modification time
    out.putInt(timescale).putInt(duration)
    out.put(new Array[Byte](108 - 28)) // rate/volume/matrix/next_track_id
    (1 to nTrak).foreach(_ => out.putInt(8).put("trak".getBytes("US-ASCII")))
    out.array()
  }

  /** REAL full decode via the JDK's own codec (`javax.imageio` ships PNG/
    * GIF/BMP readers — no external libs): decompress the raster and
    * report dimensions plus pixel probes (top-left gray value, mean gray
    * value). This is the deep end of the multimodal ladder — m1–m6 parse
    * real headers byte-by-byte, m7 runs a real codec over real
    * compressed bytes. Returns None when no registered reader accepts the
    * bytes (corrupt input costs one row, never an executor).
    */
  def decodePixels(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sum += img.getRGB(x, y) & 0xFF // blue channel == gray for gray fills
            x += 1
          }
          y += 1
        }
        Some((w, h, img.getRGB(0, 0) & 0xFF, (sum / (w.toLong * h)).toInt))
      }
    } catch {
      // NonFatal, not just IOException: JDK readers throw unchecked
      // exceptions (IllegalArgument/IndexOutOfBounds/NegativeArraySize)
      // on bytes that pass the format probe but are internally malformed
      case scala.util.control.NonFatal(_) => None
    }

  /** Decode a (id, image) pair stream into pixel-level facts via
    * [[decodePixels]]; undecodable rows are dropped. Same pruned-input /
    * mapPartitions discipline as the other decode stages.
    */
  def decodeImagePixels(spark: SparkSession, pruned: DataFrame): Dataset[ImagePixels] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        decodePixels(bytes).map { case (w, h, p0, mean) =>
          ImagePixels(id, w, h, p0, mean)
        }
      }
    }
  }

  /** REAL compressed PNG bytes: a `w`×`h` image uniformly filled with
    * gray value `gray`, encoded by the JDK's PNG writer. Uniform fill
    * makes every decoded pixel probe exactly predictable (PNG is
    * lossless) while the bytes still round-trip a genuine
    * deflate-compressed raster.
    */
  def pngBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic nearest-neighbor resize: output pixel (x, y) samples
    * source pixel (x*srcW/outW, y*srcH/outH) — pure integer math, no
    * Graphics2D interpolation whose rounding could vary by JVM. The
    * standard thumbnail/downsample stage of an image pipeline.
    */
  def resizeNearest(img: java.awt.image.BufferedImage, outW: Int, outH: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < outH) {
      val sy = y * img.getHeight / outH
      var x = 0
      while (x < outW) {
        out.setRGB(x, y, img.getRGB(x * img.getWidth / outW, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode (real codec) → nearest-neighbor half-size resize → probe: the
    * decode/transform/re-measure chain of a real image pipeline, with
    * undecodable rows dropped. Probes are the bottom-right and center
    * pixels of the resized raster.
    */
  def decodeAndResize(spark: SparkSession, pruned: DataFrame): Dataset[ResizedImage] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) None
          else {
            val (ow, oh) = (math.max(1, img.getWidth / 2), math.max(1, img.getHeight / 2))
            val r = resizeNearest(img, ow, oh)
            Some(ResizedImage(id, ow, oh,
              r.getRGB(ow - 1, oh - 1) & 0xFF, r.getRGB(ow / 2, oh / 2) & 0xFF))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** REAL compressed PNG with a deterministic diagonal gradient —
    * pixel (x, y) has gray value (x + y) % 256, so any resample's probes
    * are exactly predictable by integer arithmetic.
    */
  def pngGradientBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (x + y) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Average-hash (aHash) image fingerprint over a REAL decoded raster:
    * 8×8 integer block means compared against the global mean, one bit
    * per block (bit p = 8·by + bx, set iff blockSum·(w·h) >
    * globalSum·(bw·bh) — cross-multiplied, so no FP division touches the
    * bits). The classic perceptual near-dup key: images differing by
    * resize/re-encode keep the same hash, so exact dedup (d1) collapses
    * them. Requires dimensions divisible by 8; gray level = red channel
    * (our rasters are grayscale-in-RGB).
    */
  def imageAHash(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w % 8 != 0 || h % 8 != 0) return None
      val bw = w / 8; val bh = h / 8
      val blockSums = Array.ofDim[Long](64)
      var globalSum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = (img.getRGB(x, y) >> 16) & 0xFF
          blockSums(8 * (y / bh) + (x / bw)) += g
          globalSum += g
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var p = 0
      while (p < 64) {
        if (blockSums(p) * (w.toLong * h) > globalSum * (bw.toLong * bh)) hash |= 1L << p
        p += 1
      }
      Some((w, h, hash))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Parse every frame of a (id, gif) pair stream via [[gifFrames]] —
    * real multi-frame extraction from real container bytes, same
    * pruned-input/mapPartitions discipline as the other decode stages.
    */
  def decodeGifFrames(spark: SparkSession, pruned: DataFrame): Dataset[GifFrame] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        gifFrames(bytes).iterator.zipWithIndex.map { case ((off, w, h), idx) =>
          GifFrame(id, idx, off, w, h)
        }
      }
    }
  }

  /** Minimal multi-frame GIF (no color tables, 4-byte LZW payload per
    * frame) — a test/oracle fixture for [[gifFrames]]. Frame k is
    * `widths(k)` × `heights(k)` at byte offset 13 + 17k.
    */
  def gifFixture(widths: Seq[Int], heights: Seq[Int]): Array[Byte] = {
    require(widths.length == heights.length)
    val out = java.nio.ByteBuffer.allocate(13 + 17 * widths.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII"))
    out.putShort(widths.max.toShort).putShort(heights.max.toShort)
      .put(0.toByte).put(0.toByte).put(0.toByte) // no global color table
    widths.indices.foreach { k =>
      out.put(0x2C.toByte).putShort(0.toShort).putShort(0.toShort)
        .putShort(widths(k).toShort).putShort(heights(k).toShort)
        .put(0.toByte)            // no local color table
        .put(2.toByte)            // LZW minimum code size
        .put(4.toByte).putInt(0)  // one 4-byte data sub-block
        .put(0.toByte)            // block terminator
    }
    out.put(0x3B.toByte)
    out.array()
  }

  /** Animated-GIF fixture: like [[gifFixture]] but each frame is preceded
    * by a REAL Graphic Control Extension block carrying its delay
    * (centiseconds) — the bytes [[gifFrameDelays]] must parse.
    */
  def gifFixtureAnimated(
      widths: Seq[Int], heights: Seq[Int], delaysCs: Seq[Int]): Array[Byte] = {
    require(widths.length == heights.length && widths.length == delaysCs.length)
    val out = java.nio.ByteBuffer.allocate(13 + 25 * widths.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII"))
    out.putShort(widths.max.toShort).putShort(heights.max.toShort)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    widths.indices.foreach { k =>
      // GCE: introducer, label 0xF9, size 4, flags, delay(le16), transp, term
      out.put(0x21.toByte).put(0xF9.toByte).put(4.toByte)
        .put(0.toByte).putShort(delaysCs(k).toShort).put(0.toByte).put(0.toByte)
      out.put(0x2C.toByte).putShort(0.toShort).putShort(0.toShort)
        .putShort(widths(k).toShort).putShort(heights(k).toShort)
        .put(0.toByte).put(2.toByte)
        .put(4.toByte).putInt(0)
        .put(0.toByte)
    }
    out.put(0x3B.toByte)
    out.array()
  }

  /** Per-frame delays from the real GIF block chain: each Graphic Control
    * Extension's centisecond delay applies to the NEXT image descriptor
    * (and resets after it, per the spec — a frame with no preceding GCE
    * has delay 0). Returns (frame_idx, delay_cs, width, height).
    */
  def gifFrameDelays(bytes: Array[Byte]): Seq[(Int, Int, Int, Int)] = {
    def le16(i: Int): Int = (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8)
    if (bytes.length < 14 ||
        !"GIF87a.GIF89a".split('.').exists(sig =>
          bytes.take(6).sameElements(sig.getBytes("US-ASCII")))) return Nil
    var i = 6 + 4
    val packed = bytes(i) & 0xFF
    i += 3 // packed + bg color + aspect
    if ((packed & 0x80) != 0) i += 3 * (1 << ((packed & 0x07) + 1))
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
    var pendingDelay = 0
    var idx = 0
    // every cursor advance is bounds-checked: a truncated/malformed block
    // chain stops at what parsed — it must never throw (the gifFrames rule)
    def skipSubBlocks(): Boolean = {
      while (i < bytes.length && (bytes(i) & 0xFF) != 0) i += 1 + (bytes(i) & 0xFF)
      i += 1
      i <= bytes.length
    }
    while (i >= 0 && i < bytes.length && (bytes(i) & 0xFF) != 0x3B) {
      (bytes(i) & 0xFF) match {
        case 0x21 if i + 2 < bytes.length =>
          val label = bytes(i + 1) & 0xFF
          i += 2
          if (label == 0xF9 && (bytes(i) & 0xFF) >= 4 && i + 3 < bytes.length)
            pendingDelay = le16(i + 2)
          if (!skipSubBlocks()) return frames.toSeq
        case 0x2C if i + 9 < bytes.length =>
          val w = le16(i + 5); val h = le16(i + 7)
          val flags = bytes(i + 9) & 0xFF
          i += 10
          if ((flags & 0x80) != 0) i += 3 * (1 << ((flags & 0x07) + 1))
          i += 1 // LZW min code size
          if (i >= bytes.length || !skipSubBlocks()) return frames.toSeq
          frames += ((idx, pendingDelay, w, h))
          pendingDelay = 0 // GCE scope is one image, per spec
          idx += 1
        case _ => return frames.toSeq // malformed tail: stop at what parsed
      }
    }
    frames.toSeq
  }

  def decodeMp3Frames(spark: SparkSession, pruned: DataFrame): Dataset[Mp3Frame] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        mp3Frames(bytes).map { case (k, kbps, rate, len) =>
          Mp3Frame(id, k, kbps, rate, len)
        }
      }
    }
  }

  def decodeExif(spark: SparkSession, pruned: DataFrame): Dataset[ExifMeta] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        exifOrientation(bytes).map { case (w, h, o, big) =>
          ExifMeta(id, w, h, o, big)
        }
      }
    }
  }

  def decodeGifDelays(spark: SparkSession, pruned: DataFrame): Dataset[GifFrameTiming] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        gifFrameDelays(bytes).map { case (k, d, w, h) =>
          GifFrameTiming(id, k, d, w, h)
        }
      }
    }
  }

  /** Frame sampling STUB: one frame window per `every` bytes (a real
    * build seeks keyframes via the container index). One input row fans
    * out to ceil(len/every) frame rows — the iterator shape a codec's
    * demuxer produces. Fan-out happens inside `mapPartitions`, so no
    * exploded intermediate materializes.
    */
  def sampleFrames(spark: SparkSession, pruned: DataFrame, every: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    require(every > 0, "frame stride must be positive")
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val n = math.max(1, (bytes.length + every - 1) / every)
        (0 until n).iterator.map { i =>
          val off = i.toLong * every
          val len = math.min(every, bytes.length - off).toInt max 0
          MediaFrame(id, i, off, len)
        }
      }
    }
  }
}
