package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (Web ARChive, ISO 28500) ingestion — the front door of a web-scale
  * training-data pipeline. Common Crawl, the Internet Archive, and every
  * in-house crawler ship page captures as WARC: a concatenation of records,
  * each a `WARC/1.x` header block (CRLF-separated `Name: value` lines, an
  * empty line), exactly `Content-Length` payload bytes, and a blank-line
  * separator. `response` records carry a full HTTP message as payload —
  * status line, headers, body — which [[Warc.read]] additionally splits so
  * downstream operators start from the body bytes.
  *
  * Scale posture (the shape that survives 100 TB): one WARC file = one
  * input split = one task — Common Crawl publishes ~80k files of ~1 GiB per
  * crawl, so a 1000-executor cluster parallelizes across FILES, the
  * industry-standard WARC processing model (gzipped WARC is a chain of
  * per-record gzip members and is not block-splittable). Records are
  * STREAM-parsed through `binaryFiles`' `PortableDataStream`: memory per
  * task is bounded by the largest single record (capped at `maxRecordBytes`,
  * oversized payloads are skipped in O(1) memory), never by file size, and
  * the file's bytes flow through the iterator exactly once.
  *
  * Robustness: a truncated or corrupt tail (a killed crawler, a bad disk)
  * ends that FILE's iteration after the last complete record instead of
  * failing the job — at crawl scale malformed tails are data, not errors.
  * Gzip is auto-detected per file by magic, and the JDK inflater walks
  * per-record concatenated members transparently.
  *
  * This source is beyond the reference engine's surface (its sources are
  * CSV/JDBC/ES — `data/ingested/CsvReader.java`); it feeds the reference's
  * own pipeline shape by landing crawl captures as a queryable DataFrame.
  */
object Warc {

  /** One parsed WARC record. `httpStatus`/`httpContentType`/`body` are the
    * HTTP split of a `response`/`revisit` payload when one is present
    * (status 0 and body == payload otherwise). `seq` is the record's
    * 0-based position in its file — the stable sort key within a file. */
  case class Record(
      file: String, seq: Long, warcType: String, url: String, date: String,
      recordId: String, contentType: String, contentLength: Long,
      httpStatus: Int, httpContentType: String, body: Array[Byte])

  /** Read every record of every WARC file under `path` (glob OK; plain and
    * per-record-gzipped files mix freely) into a DataFrame of [[Record]]
    * columns. One task per file; per-task memory is bounded by
    * `maxRecordBytes`, not file size. */
  def read(spark: SparkSession, path: String,
      maxRecordBytes: Long = 256L << 20): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) => recordIterator(file, pds.open(), maxRecordBytes) }
      .toDF()
  }

  /** Page-extraction convenience: `response` records with an HTML(ish)
    * body, decoded as UTF-8 and stripped to visible text
    * ([[graft.functions.TextKernels.htmlToText]]) — the `(url, date, text)`
    * frame the curation loop ([[graft.streaming.StreamOps]]) ingests. */
  def pages(spark: SparkSession, path: String,
      maxRecordBytes: Long = 256L << 20): DataFrame =
    toPages(read(spark, path, maxRecordBytes))

  /** Streaming twin of [[read]]: watch `dir` for newly landed WARC files
    * (the shape of a live crawl: the crawler closes a file, the pipeline
    * picks it up) and emit their parsed records as a streaming DataFrame —
    * plug directly into [[graft.streaming.StreamOps.curationStream]] for
    * the crawl-to-corpus loop. Built on the `binaryFile` file-stream
    * source, so discovered-file tracking, checkpointing, and at-least-once
    * re-delivery follow the standard Structured Streaming contract (and
    * the curation loop's batchId-keyed index appends make replays
    * idempotent downstream).
    *
    * Unlike the batch path, the file source materializes each file's bytes
    * as one row before parsing, so per-task memory here is bounded by FILE
    * size — size crawl output files accordingly (Common Crawl's ~1 GiB
    * works; cap intake per micro-batch with `maxFilesPerTrigger`). Use
    * [[read]] for bulk backfill of an existing archive. */
  def readStream(spark: SparkSession, dir: String,
      maxRecordBytes: Long = 256L << 20, maxFilesPerTrigger: Int = 0)
      : DataFrame = {
    import spark.implicits._
    // the binaryFile schema is fixed by the format, but the streaming
    // source requires it stated explicitly
    val reader = spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
    reader.load(dir)
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        recordIterator(file, new java.io.ByteArrayInputStream(bytes), maxRecordBytes)
      }
      .toDF()
  }

  /** Streaming twin of [[pages]]: newly landed WARC files, as extracted
    * `(url, date, text)` page rows. */
  def pagesStream(spark: SparkSession, dir: String,
      maxRecordBytes: Long = 256L << 20, maxFilesPerTrigger: Int = 0)
      : DataFrame =
    toPages(readStream(spark, dir, maxRecordBytes, maxFilesPerTrigger))

  /** The [[pages]] filter + projection, shared by the batch and streaming
    * paths: 200-status HTML(ish) responses, body decoded and stripped. */
  private def toPages(records: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    records
      .where(col("warcType") === "response" && col("httpStatus") === 200 &&
        (col("httpContentType").startsWith("text/html") ||
          col("httpContentType").startsWith("application/xhtml")))
      .select(col("url"), col("date"),
        graft.functions.TextKernels.htmlToText(decode(col("body"), "UTF-8")).as("text"))
  }

  // ------------------------------------------------------------------ parse

  /** Lazy, single-pass record iterator over one WARC stream. Closes the
    * stream at EOF or on the first malformed record (documented degrade). */
  private[graft] def recordIterator(file: String, raw: InputStream,
      maxRecordBytes: Long): Iterator[Record] = {
    val in = new BufferedInputStream(raw, 1 << 16)
    in.mark(2)
    val m0 = in.read(); val m1 = in.read()
    in.reset()
    val stream: InputStream =
      if (m0 == 0x1f && m1 == 0x8b) {
        // the gzip header is read by the CONSTRUCTOR — magic followed by a
        // corrupt header must degrade like any other malformed tail, not
        // throw out of the source
        try new BufferedInputStream(new GZIPInputStream(in, 1 << 16), 1 << 16)
        catch { case _: java.io.IOException =>
          try in.close() catch { case _: Throwable => () }
          return Iterator.empty
        }
      } else in

    new Iterator[Record] {
      private var nextRec: Record = _
      private var done = false
      private var recSeq = 0L

      private def close(): Unit = { done = true; try stream.close() catch { case _: Throwable => () } }

      private def advance(): Unit = {
        if (done || nextRec != null) return
        try {
          var rec: Record = null
          while (rec == null && !done) {
            parseOne(file, stream, recSeq, maxRecordBytes) match {
              case ParsedRecord(r) => rec = r; recSeq += 1
              case SkippedRecord => recSeq += 1 // oversized — position still counts
              case EndOfStream => close()
            }
          }
          nextRec = rec
        } catch { case _: EOFException | _: java.io.IOException => close() }
      }

      def hasNext: Boolean = { advance(); nextRec != null }
      def next(): Record = {
        advance()
        if (nextRec == null) throw new NoSuchElementException("end of WARC stream")
        val r = nextRec; nextRec = null; r
      }
    }
  }

  private sealed trait ParseResult
  private case class ParsedRecord(r: Record) extends ParseResult
  private case object SkippedRecord extends ParseResult
  private case object EndOfStream extends ParseResult

  /** Read one CRLF/LF-terminated line as ISO-8859-1 (WARC headers are
    * octets); null at EOF before any byte. */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(96)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') { sb.append(c.toChar); c = in.read() }
    val n = sb.length()
    if (n > 0 && sb.charAt(n - 1) == '\r') sb.setLength(n - 1)
    sb.toString
  }

  private def readFully(in: InputStream, buf: Array[Byte]): Boolean = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) return false
      off += n
    }
    true
  }

  private def skipFully(in: InputStream, n: Long): Boolean = {
    var left = n
    val scratch = new Array[Byte](8192)
    while (left > 0) {
      val got = in.read(scratch, 0, math.min(left, scratch.length.toLong).toInt)
      if (got < 0) return false
      left -= got
    }
    true
  }

  private def parseOne(file: String, in: InputStream, seq: Long,
      maxRecordBytes: Long): ParseResult = {
    // Skip blank separator lines, find the version line.
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return EndOfStream
    if (!line.startsWith("WARC/")) return EndOfStream // malformed — degrade

    val headers = scala.collection.mutable.Map.empty[String, String]
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      val i = h.indexOf(':')
      if (i > 0) headers(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
      h = readLine(in)
    }
    if (h == null) return EndOfStream // EOF inside the header block

    val len = headers.get("content-length").flatMap(s => s.toLongOption).getOrElse(-1L)
    if (len < 0) return EndOfStream // unframeable without a length — degrade

    if (len > maxRecordBytes) {
      if (!skipFully(in, len)) return EndOfStream
      return SkippedRecord
    }
    val payload = new Array[Byte](len.toInt)
    if (!readFully(in, payload)) return EndOfStream // truncated tail

    val warcType = headers.getOrElse("warc-type", "")
    val (status, httpCt, body) =
      if ((warcType == "response" || warcType == "revisit") && startsWithHttp(payload))
        splitHttp(payload)
      else (0, "", payload)

    ParsedRecord(Record(
      file = file, seq = seq, warcType = warcType,
      url = headers.getOrElse("warc-target-uri", ""),
      date = headers.getOrElse("warc-date", ""),
      recordId = headers.getOrElse("warc-record-id", ""),
      contentType = headers.getOrElse("content-type", ""),
      contentLength = len, httpStatus = status, httpContentType = httpCt,
      body = body))
  }

  private def startsWithHttp(p: Array[Byte]): Boolean =
    p.length >= 5 && p(0) == 'H' && p(1) == 'T' && p(2) == 'T' && p(3) == 'P' && p(4) == '/'

  /** Split an HTTP message payload into (status, content-type, body).
    * Headers end at the first CRLFCRLF (LFLF tolerated); a payload with no
    * header terminator is all headers and an empty body (truncated
    * capture). */
  private[sources] def splitHttp(p: Array[Byte]): (Int, String, Array[Byte]) = {
    var split = -1; var skip = 0
    var i = 0
    while (split < 0 && i < p.length - 1) {
      if (p(i) == '\n') {
        if (p(i + 1) == '\n') { split = i + 1; skip = 1 }
        else if (i + 2 < p.length && p(i + 1) == '\r' && p(i + 2) == '\n') { split = i + 1; skip = 2 }
      }
      i += 1
    }
    val headerEnd = if (split < 0) p.length else split
    val head = new String(p, 0, headerEnd, "ISO-8859-1")
    val lines = head.split("\r?\n")
    val status = lines.headOption.map(_.split(" ", 3)).filter(_.length >= 2)
      .flatMap(a => a(1).toIntOption).getOrElse(0)
    val ct = lines.iterator.drop(1)
      .map(l => (l, l.indexOf(':')))
      .collectFirst { case (l, i) if i > 0 && l.substring(0, i).trim.equalsIgnoreCase("content-type") =>
        l.substring(i + 1).trim }
      .getOrElse("")
    val body = if (split < 0) Array.empty[Byte]
      else java.util.Arrays.copyOfRange(p, split + skip, p.length)
    (status, ct, body)
  }
}
