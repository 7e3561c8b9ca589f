package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed metadata for one decoded media asset. */
case class MediaMeta(doc_id: Long, n_bytes: Int, fake_width: Int,
                     fake_height: Int, channels: Int, header_hex: String)

/** Multimodal binary-column plumbing: media content travels as an
  * opaque `binary` column; decode / feature-extraction runs
  * partition-wise over batches of payloads and emits a typed metadata
  * row per asset.
  *
  * The DECODE STEP IS A STUB — image/audio codecs are not available
  * in this container, so `decodeOne` derives deterministic fake
  * dimensions from the first payload bytes. Everything around it is
  * the real shape a production decoder plugs into: binary payloads
  * stay off the driver, batching is per partition (amortizes decoder
  * init exactly like a vectorized-UDF batch), and the output schema
  * is a typed Dataset. Swap `decodeOne` for a real codec and nothing
  * else changes.
  *
  * Scale posture: decode parallelism = partition count; a 100 TB
  * media corpus runs this as a narrow map with no shuffle, and
  * metadata (a few dozen bytes/asset) is what downstream joins touch.
  */
object BinaryDecode {

  /** STUB: deterministic fake decode of one payload. */
  def decodeOne(id: Long, bytes: Array[Byte]): MediaMeta = {
    val w = if (bytes.length > 0) bytes(0) & 0xff else 0
    val h = if (bytes.length > 1) bytes(1) & 0xff else 0
    val header = bytes.take(4).map(b => f"$b%02X").mkString
    MediaMeta(id, bytes.length, w, h, 3, header)
  }

  /** Partition-wise decode of (id, payload) batches. */
  def decodeBatch(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaMeta] =
    rows.map { case (id, bytes) => decodeOne(id, bytes) }

  /** Decode a Dataset of (id, payload) rows into typed metadata. */
  def decode(spark: SparkSession, ds: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import spark.implicits._
    ds.mapPartitions(decodeBatch)
  }

  /** STUB frame sampling: one metadata row per sampled "frame" (every
    * `everyN`-th 16-byte window) — the 1→N decode shape a video/audio
    * extractor produces. Real codecs replace the window arithmetic;
    * the explode-to-frames plumbing and bounded per-frame metadata
    * are the real part. */
  def frameSample(id: Long, bytes: Array[Byte], everyN: Int): Seq[FrameMeta] = {
    val frameSize = 16
    val nFrames = bytes.length / frameSize
    (0 until nFrames by everyN).map { f =>
      val off = f * frameSize
      val checksum = bytes.slice(off, off + frameSize)
        .foldLeft(0)((a, b) => (a * 31 + (b & 0xff)) & 0x7fffffff)
      FrameMeta(id, f, off, checksum)
    }
  }

  /** Partition-wise frame sampling over (id, payload) batches. */
  def frameSampleBatch(everyN: Int)(
      rows: Iterator[(Long, Array[Byte])]): Iterator[FrameMeta] =
    rows.flatMap { case (id, bytes) => frameSample(id, bytes, everyN) }

  /** STUB resize: produce a deterministic fake (w × h × 3)-byte
    * "image" by nearest-neighbor sampling the source bytes — the
    * fixed-size-output transform a real resizer performs. Output size
    * is bounded and independent of input size, which is the property
    * downstream batch sizing relies on. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    if (bytes.nonEmpty) {
      var i = 0
      while (i < out.length) {
        out(i) = bytes((i.toLong * bytes.length / out.length).toInt)
        i += 1
      }
    }
    out
  }
}

/** Typed metadata for one sampled frame. */
case class FrameMeta(doc_id: Long, frame_idx: Int, byte_offset: Int, checksum: Int)
