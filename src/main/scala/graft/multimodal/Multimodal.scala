package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column support for training-data pipelines: media payloads as
  * opaque `binary` columns with typed metadata, processed batch-at-a-time
  * inside partitions (the Scala analogue of `mapInPandas` — one iterator
  * per partition, vectorizable batch shape, no driver materialization).
  *
  * The decode step is a STUB: this container has no image/audio codecs, so
  * `decodeBatch` derives deterministic fake metadata from the bytes. The
  * Spark-side plumbing — schema, encoders, partition-batched processing,
  * binary transport — is real and tested; swapping in a real codec changes
  * only the body of `decodeBatch`.
  */
object Multimodal {

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

  /** STUB decode: deterministic fake dimensions derived from the payload.
    * A real implementation would decode the codec headers here (and only
    * here). Runs partition-batched: the iterator processes each partition's
    * rows in one pass, the shape a vectorized codec call needs. */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaMeta] =
    rows.map { r =>
      val n = r.data.length.toLong
      // ??? real codec goes here — deterministic fake below
      val w = 16 + (n % 64).toInt
      val h = 16 + (n % 48).toInt
      val f = if (r.kind == "video") 1 + (n % 30).toInt else 1
      MediaMeta(r.id, r.kind, n, w, h, f)
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
