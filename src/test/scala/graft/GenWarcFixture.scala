package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession

/** One-off generator for the WARC ingestion fixtures — committed ground
  * truth for the `q_warc_read` / `q_html_text` oracles, following the
  * multimodal fixture discipline ([[GenAvFixture]]): the ground truth is
  * what the WRITER encoded, independent of the parser under test.
  *
  *  - `fixtures/warc/sample-plain.warc` — plain WARC: warcinfo, request,
  *    HTML/plain/404 responses, metadata, and a TRUNCATED tail record
  *    (declared Content-Length exceeds the remaining bytes) that the
  *    reader must degrade past, keeping every complete record before it;
  *  - `fixtures/warc/sample-gz.warc.gz` — per-record concatenated gzip
  *    members (the Common Crawl layout): LF-only HTTP headers, XHTML,
  *    a `conversion` record, numeric/named entities;
  *  - `fixtures/warc/tail-garbage.warc` — one good record then non-WARC
  *    bytes (a corrupted tail must end the file, not fail the job);
  *  - `fixtures/warc_expected.parquet` — the writer-side truth: one row
  *    per record that must parse (url, type, status, content type, body
  *    byte count) plus, for the extractable HTML pages, the prose the
  *    generator EMBEDDED into the markup it built — so the q_html_text
  *    hash-match proves the tag/entity stripper recovers the author's
  *    text, not a formula.
  *
  * Run once: `sbt "Test/runMain graft.GenWarcFixture"`, commit the output.
  * Deterministic: fixed content, fixed order, one parquet file. */
object GenWarcFixture {

  private val CRLF = "\r\n"

  /** HTML-escape prose the way a page author would. */
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Build an HTML page around known prose chunks; extraction ground truth
    * is exactly `chunks.mkString(" ")`. */
  private def page(title: String, chunks: Seq[String]): String = {
    val blocks = chunks.zipWithIndex.map { case (c, i) =>
      i % 3 match {
        case 0 => s"<h1 class='t'>${esc(c)}</h1>"
        case 1 => s"<p>${esc(c)}</p>"
        case _ => s"<div >${esc(c)}</div>"
      }
    }
    s"<html><head><title>${esc(title)}</title><style>p{color:red}</style>" +
      s"<script type='text/javascript'>var x = 1 < 2;</script></head>" +
      s"<body><!-- nav follows -->${blocks.mkString("<!-- sep -->")}</body></html>"
  }

  private def httpResponse(status: Int, reason: String, ct: String,
      body: Array[Byte], lfOnly: Boolean = false): Array[Byte] = {
    val sep = if (lfOnly) "\n" else CRLF
    val head = s"HTTP/1.1 $status $reason${sep}Content-Type: $ct${sep}" +
      s"X-Crawler: graft-fixture${sep}Content-Length: ${body.length}${sep}${sep}"
    head.getBytes("ISO-8859-1") ++ body
  }

  private def record(typ: String, url: String, date: String, id: String,
      contentType: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "WARC/1.0" ++= CRLF
    sb ++= s"WARC-Type: $typ" ++= CRLF
    if (url.nonEmpty) sb ++= s"WARC-Target-URI: $url" ++= CRLF
    sb ++= s"WARC-Date: $date" ++= CRLF
    sb ++= s"WARC-Record-ID: <urn:uuid:$id>" ++= CRLF
    if (contentType.nonEmpty) sb ++= s"Content-Type: $contentType" ++= CRLF
    sb ++= s"Content-Length: ${payload.length}" ++= CRLF ++= CRLF
    sb.toString.getBytes("ISO-8859-1") ++ payload ++ (CRLF + CRLF).getBytes("ISO-8859-1")
  }

  private def gzMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** (expectedRow, recordBytes). expectedRow = (url, warcType, httpStatus,
    * httpContentType, nBodyBytes, date, pageText | null). */
  private case class Rec(bytes: Array[Byte], url: String, typ: String,
      status: Int, httpCt: String, nBody: Long, date: String, text: String)

  private def respRec(url: String, date: String, id: String, ct: String,
      status: Int, reason: String, body: Array[Byte], text: String,
      lfOnly: Boolean = false): Rec = {
    val payload = httpResponse(status, reason, ct, body, lfOnly)
    Rec(record("response", url, date, id, "application/http; msgtype=response", payload),
      url, "response", status, ct, body.length.toLong, date, text)
  }

  def main(args: Array[String]): Unit = {
    val d1 = "2026-01-15T08:30:00Z"
    val d2 = "2026-01-15T09:00:00Z"

    // ---- plain file --------------------------------------------------
    val infoBody = ("software: graft-fixture/11" + CRLF + "format: WARC File Format 1.0" + CRLF)
      .getBytes("UTF-8")
    val warcinfo = Rec(record("warcinfo", "", d1, "info-1", "application/warc-fields", infoBody),
      "", "warcinfo", 0, "", infoBody.length.toLong, d1, null)

    val reqBody = ("GET /p1 HTTP/1.1" + CRLF + "Host: a.example" + CRLF + CRLF).getBytes("ISO-8859-1")
    val request = Rec(record("request", "https://a.example/p1", d1, "req-1",
      "application/http; msgtype=request", reqBody),
      "https://a.example/p1", "request", 0, "", reqBody.length.toLong, d1, null)

    val p1Chunks = Seq("Welcome to page one", "Crawled text & 'quoted' prose survives.",
      "A literal <tag> stays readable")
    val p1 = respRec("https://a.example/p1", d1, "resp-1", "text/html; charset=utf-8",
      200, "OK", page("Page one", p1Chunks).getBytes("UTF-8"), p1Chunks.mkString(" "))

    val plainBody = "just plain text payload, no markup".getBytes("UTF-8")
    val p2 = respRec("https://a.example/p2.txt", d1, "resp-2", "text/plain",
      200, "OK", plainBody, null)

    val p3 = respRec("https://a.example/gone", d1, "resp-3", "text/html",
      404, "Not Found", page("Gone", Seq("This page was removed")).getBytes("UTF-8"), null)

    val metaBody = ("fetchTimeMs: 120" + CRLF).getBytes("UTF-8")
    val metadata = Rec(record("metadata", "https://a.example/p1", d1, "meta-1",
      "application/warc-fields", metaBody),
      "https://a.example/p1", "metadata", 0, "", metaBody.length.toLong, d1, null)

    // Truncated tail: header promises 500 payload bytes, file ends after 20.
    val truncated = {
      val head = ("WARC/1.0" + CRLF + "WARC-Type: response" + CRLF +
        "WARC-Target-URI: https://a.example/truncated" + CRLF +
        s"WARC-Date: $d1" + CRLF + "Content-Length: 500" + CRLF + CRLF)
        .getBytes("ISO-8859-1")
      head ++ "HTTP/1.1 200 OK\r\nCon".getBytes("ISO-8859-1")
    }

    val plainRecs = Seq(warcinfo, request, p1, p2, p3, metadata)
    val plainBytes = plainRecs.map(_.bytes).reduce(_ ++ _) ++ truncated

    // ---- gzip file (one member per record — the Common Crawl layout) --
    val p4Chunks = Seq("Gzip page four", "LF only headers still split",
      "Entities: 6 > 5 & 5 < 6")
    val p4 = respRec("https://b.example/p4", d2, "resp-4", "text/html",
      200, "OK", page("Four", p4Chunks).getBytes("UTF-8"), p4Chunks.mkString(" "), lfOnly = true)

    val p5Chunks = Seq("XHTML page five", "Served as application xhtml")
    val p5 = respRec("https://b.example/p5", d2, "resp-5", "application/xhtml+xml",
      200, "OK", page("Five", p5Chunks).getBytes("UTF-8"), p5Chunks.mkString(" "))

    val convBody = "pre-extracted text of some capture".getBytes("UTF-8")
    val conversion = Rec(record("conversion", "https://b.example/p4", d2, "conv-1",
      "text/plain", convBody),
      "https://b.example/p4", "conversion", 0, "", convBody.length.toLong, d2, null)

    val p6Chunks = Seq("Page six headline", "First paragraph of page six.",
      "Second block with more crawled prose.", "Closing line")
    val p6 = respRec("https://b.example/p6", d2, "resp-6", "text/html; charset=utf-8",
      200, "OK", page("Six", p6Chunks).getBytes("UTF-8"), p6Chunks.mkString(" "))

    val gzRecs = Seq(p4, p5, conversion, p6)
    val gzBytes = gzRecs.map(r => gzMember(r.bytes)).reduce(_ ++ _)

    // ---- garbage-tail file -------------------------------------------
    val p7Chunks = Seq("Page seven before the corruption")
    val p7 = respRec("https://c.example/p7", d2, "resp-7", "text/html",
      200, "OK", page("Seven", p7Chunks).getBytes("UTF-8"), p7Chunks.mkString(" "))
    val garbageBytes = p7.bytes ++ "NOT A WARC RECORD - CORRUPTED TAIL %%%%".getBytes("ISO-8859-1")

    // ---- write -------------------------------------------------------
    val dir = java.nio.file.Paths.get("fixtures", "warc")
    java.nio.file.Files.createDirectories(dir)
    def put(name: String, bytes: Array[Byte]): Unit = {
      val f = new FileOutputStream(dir.resolve(name).toFile)
      try f.write(bytes) finally f.close()
    }
    put("sample-plain.warc", plainBytes)
    put("sample-gz.warc.gz", gzBytes)
    put("tail-garbage.warc", garbageBytes)

    val all = plainRecs ++ gzRecs :+ p7
    val spark = SparkSession.builder().appName("gen-warc-fixture")
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val rows = all.map(r => (r.url, r.typ, r.status, r.httpCt, r.nBody, r.date, r.text))
    val tmp = java.nio.file.Files.createTempDirectory("warc-fixture").toString
    rows.toDF("url", "warc_type", "http_status", "http_content_type",
        "n_body_bytes", "date", "page_text")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    // single flat file, like the other committed fixtures
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp)).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val target = java.nio.file.Paths.get("fixtures", "warc_expected.parquet")
    if (java.nio.file.Files.isDirectory(target)) {
      java.nio.file.Files.walk(target).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    } else java.nio.file.Files.deleteIfExists(target)
    var moved = false
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) {
        java.nio.file.Files.move(p, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        moved = true
      }
    }
    require(moved, "no parquet part file produced")
    println(s"wrote ${all.size} expected rows, 3 warc files")
    spark.stop()
  }
}
