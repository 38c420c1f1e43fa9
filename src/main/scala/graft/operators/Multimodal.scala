package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Decoded-media metadata row (the output schema of the decode stage). */
final case class MediaMeta(
    doc_id: Long, byte_len: Long, width: Int, height: Int, format: String)

/** One sampled frame: byte offset + length of the frame window. */
final case class MediaFrame(
    doc_id: Long, frame_idx: Int, frame_off: Long, frame_len: Int)

/** Multimodal-column plumbing (north-star surface): media travels as an
  * opaque `binary` column with typed metadata alongside.
  *
  * The decode step is a clearly-marked deterministic STUB (the container
  * has no image/audio codecs); everything around it — schema, encoder,
  * partition-parallel batching via `mapPartitions`, column pruning before
  * the heavy stage — is real. At scale the binary column is the widest
  * thing in the table, so the plumbing:
  *  - prunes to (id, media) BEFORE the decode stage (never carries other
  *    columns through the non-codegen boundary);
  *  - processes per-partition with an iterator (no per-row lambda setup,
  *    no collect), the same shape a JNI/codec batch decode needs.
  */
object Multimodal {

  /** STUB decode: deterministic pseudo-metadata from the raw bytes. A real
    * build replaces the body with an actual codec (e.g. TwelveMonkeys /
    * javax.imageio) — signature and dataflow unchanged.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, String) = {
    val len = bytes.length
    val width = 16 + (len % 64)
    val height = 16 + ((len / 64) % 64)
    val fmt = (len % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    (width, height, fmt)
  }

  /** Decode a (id, media) pair stream into typed metadata. Input must be
    * pre-pruned to exactly (id: bigint, media: binary).
    */
  def decodeMetadata(spark: SparkSession, pruned: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    pruned.as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (w, h, fmt) = fakeDecode(bytes)
        MediaMeta(id, bytes.length.toLong, w, h, fmt)
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
