package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support for training-data pipelines: media payloads as
  * opaque `binary` columns with typed metadata, processed batch-at-a-time
  * inside partitions (the Scala analogue of `mapInPandas` — one iterator
  * per partition, vectorizable batch shape, no driver materialization).
  *
  * Image dimension extraction is REAL, pure-JVM, and reads only the first
  * bytes of each payload: PNG IHDR, GIF logical screen descriptor, and the
  * JPEG SOFn frame header ([[parseDimensions]]) — no external codec needed,
  * the format containers publish width/height in their headers. Payloads in
  * any other format (video containers, audio, opaque bytes) fall back to a
  * clearly-marked deterministic STUB: full pixel/frame decoding needs codecs
  * this container does not ship, and swapping a real one in changes only
  * that branch of `decodeBatch`.
  */
object Multimodal {

  /** Container-header dimension sniffing, by magic bytes (the payload's
    * `kind` label is advisory — bytes decide):
    *  - PNG: 8-byte signature, then the IHDR chunk at a fixed offset —
    *    width/height are big-endian u32 at bytes 16/20.
    *  - GIF (87a/89a): logical screen descriptor — width/height are
    *    little-endian u16 at bytes 6/8.
    *  - JPEG: walk the marker segments from SOI to the first SOFn frame
    *    header (C0-CF minus C4/C8/CC); height/width are big-endian u16 at
    *    segment offsets +5/+7.
    * Returns None for anything else — truncated streams, other containers —
    * which routes the row to the stub branch instead of throwing: a 100 TB
    * ingest WILL contain corrupt payloads and one must not kill the job. */
  def parseDimensions(data: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = data(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (data.length >= 24 && u8(0) == 0x89 && data(1) == 'P' &&
        data(2) == 'N' && data(3) == 'G' &&
        new String(data, 12, 4, java.nio.charset.StandardCharsets.US_ASCII) == "IHDR")
      Some((be32(16), be32(20)))
    else if (data.length >= 10 && data(0) == 'G' && data(1) == 'I' && data(2) == 'F' &&
        data(3) == '8' && (data(4) == '7' || data(4) == '9') && data(5) == 'a')
      Some((le16(6), le16(8)))
    else if (data.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 9 < data.length) {
        if (u8(i) != 0xff) return None // desynced marker stream
        var j = i + 1
        while (j < data.length - 1 && u8(j) == 0xff) j += 1 // skip fill bytes
        val marker = u8(j)
        if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS before any SOF
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return if (j + 8 < data.length) Some((be16(j + 6), be16(j + 4))) else None
        if (j + 2 >= data.length) return None
        val len = be16(j + 1)
        if (len < 2) return None
        i = j + 1 + len
      }
      None
    }
    else None
  }

  /** A media row: payload + envelope. */
  final case class MediaRow(id: Long, kind: String, data: Array[Byte])

  /** Typed metadata extracted by decode. */
  final case class MediaMeta(id: Long, kind: String, nBytes: Long,
      width: Int, height: Int, nFrames: Int)

  /** Wrap a string column as a binary media payload (UTF-8), standing in for
    * real image/audio bytes ingested from object storage. */
  def attachBinary(df: DataFrame, idCol: String, strCol: String, kind: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), lit(kind).as("kind"),
      encode(col(strCol), "UTF-8").as("data"))

  /** Decode one partition's rows in a single pass (the shape a vectorized
    * codec call needs). Image containers (PNG/GIF/JPEG) get REAL
    * header-parsed dimensions ([[parseDimensions]], 1 frame). Everything
    * else — video/audio containers, corrupt or opaque payloads — takes the
    * deterministic STUB branch: fake dimensions and frame counts derived
    * from the byte length (??? a real video/audio codec goes there, and
    * only there). */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaMeta] =
    rows.map { r =>
      val n = r.data.length.toLong
      parseDimensions(r.data) match {
        case Some((w, h)) => MediaMeta(r.id, r.kind, n, w, h, 1)
        case None =>
          val w = 16 + (n % 64).toInt
          val h = 16 + (n % 48).toInt
          val f = if (r.kind == "video") 1 + (n % 30).toInt else 1
          MediaMeta(r.id, r.kind, n, w, h, f)
      }
    }

  /** Decode a media frame: binary column in, typed metadata out. */
  def decode(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(decodeBatch)
  }

  /** STUB resize: a real implementation re-encodes pixels; the fake keeps a
    * deterministic prefix so byte-size bookkeeping stays testable. */
  def resize(media: DataFrame, maxBytes: Int): DataFrame =
    media.withColumn("data",
      expr(s"substring(data, 1, $maxBytes)"))

  /** STUB frame sampling for video payloads: every stride-th byte stands in
    * for every stride-th frame. */
  def frameSample(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      MediaRow(r.id, r.kind, r.data.grouped(stride).map(_.head).toArray)
    }).toDF()
  }
}
