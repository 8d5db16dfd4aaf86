package graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._

import graft.functions.TextKernels
import graft.sources.Warc

/** WARC ingestion ([[graft.sources.Warc]]) and HTML text extraction
  * ([[TextKernels.htmlToText]]): record framing, gzip member walk, HTTP
  * split, degrade-past-corruption, bounded-memory skip of oversized
  * records, and the tag/entity stripper. The committed fixture files under
  * `fixtures/warc/` are the writer-side ground truth ([[GenWarcFixture]]). */
class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private val fixtureDir = {
    val p = java.nio.file.Paths.get("fixtures", "warc").toAbsolutePath
    assume(java.nio.file.Files.exists(p), "run GenWarcFixture first")
    p.toString
  }

  private def rec(typ: String, url: String, payload: Array[Byte],
      extra: String = ""): Array[Byte] = {
    val head = s"WARC/1.0\r\nWARC-Type: $typ\r\n" +
      (if (url.nonEmpty) s"WARC-Target-URI: $url\r\n" else "") +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" + extra +
      s"Content-Length: ${payload.length}\r\n\r\n"
    head.getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  // ------------------------------------------------------------- iterator

  test("recordIterator frames consecutive records and positions seq per file") {
    val bytes = rec("resource", "u:1", "aaa".getBytes) ++
      rec("resource", "u:2", "bbbb".getBytes)
    val got = Warc.recordIterator("f", new ByteArrayInputStream(bytes), 1 << 20).toList
    assert(got.map(r => (r.seq, r.url, r.contentLength)) ==
      List((0L, "u:1", 3L), (1L, "u:2", 4L)))
    assert(got.forall(_.warcType == "resource"))
  }

  test("truncated payload ends the file after the last complete record") {
    val head = "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 100\r\n\r\nonly-ten-b"
    val bytes = rec("resource", "u:1", "ok".getBytes) ++ head.getBytes("ISO-8859-1")
    val got = Warc.recordIterator("f", new ByteArrayInputStream(bytes), 1 << 20).toList
    assert(got.map(_.url) == List("u:1"))
  }

  test("non-WARC bytes after a record end the file (corrupt tail degrade)") {
    val bytes = rec("resource", "u:1", "ok".getBytes) ++
      "THIS IS NOT WARC".getBytes("ISO-8859-1")
    val got = Warc.recordIterator("f", new ByteArrayInputStream(bytes), 1 << 20).toList
    assert(got.map(_.url) == List("u:1"))
  }

  test("oversized record is skipped in O(1) memory, later records survive") {
    val big = rec("resource", "u:big", Array.fill[Byte](1000)('x'))
    val bytes = big ++ rec("resource", "u:after", "ok".getBytes)
    val got = Warc.recordIterator("f", new ByteArrayInputStream(bytes), 100).toList
    // the oversized record still advances seq — positions stay file-stable
    assert(got.map(r => (r.seq, r.url)) == List((1L, "u:after")))
  }

  test("http split: status, content-type, body; request payloads stay whole") {
    val body = "hello body".getBytes
    val http = ("HTTP/1.1 301 Moved\r\nLocation: x\r\nContent-Type: text/html\r\n\r\n")
      .getBytes("ISO-8859-1") ++ body
    val resp = Warc.recordIterator("f",
      new ByteArrayInputStream(rec("response", "u:r", http)), 1 << 20).toList.head
    assert(resp.httpStatus == 301 && resp.httpContentType == "text/html" &&
      new String(resp.body) == "hello body")
    val req = Warc.recordIterator("f",
      new ByteArrayInputStream(rec("request", "u:q",
        "GET / HTTP/1.1\r\nHost: h\r\n\r\n".getBytes("ISO-8859-1"))), 1 << 20).toList.head
    assert(req.httpStatus == 0 && req.body.length == req.contentLength)
  }

  test("http split without a header terminator yields an empty body") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html".getBytes("ISO-8859-1")
    val got = Warc.recordIterator("f",
      new ByteArrayInputStream(rec("response", "u:t", http)), 1 << 20).toList.head
    assert(got.httpStatus == 200 && got.body.isEmpty)
  }

  // ------------------------------------------------------------- fixtures

  test("fixture round-trip: every writer-side record parses with its fields") {
    val twin = spark.read.parquet("fixtures/warc_expected.parquet")
    val got = Warc.read(spark, fixtureDir)
      .select(col("url"), col("warcType"), col("httpStatus"),
        col("httpContentType"), length(col("body")).cast("long").as("n"))
      .as[(String, String, Int, String, Long)].collect().sorted
    val want = twin.select(col("url"), col("warc_type"), col("http_status"),
        col("http_content_type"), col("n_body_bytes"))
      .as[(String, String, Int, String, Long)].collect().sorted
    assert(got.toList == want.toList)
  }

  test("pages: html 200 responses only, extracted text == embedded prose") {
    val twin = spark.read.parquet("fixtures/warc_expected.parquet")
      .where(col("page_text").isNotNull)
    val got = Warc.pages(spark, fixtureDir)
      .select(col("url"), col("text")).as[(String, String)].collect().toMap
    val want = twin.select(col("url"), col("page_text"))
      .as[(String, String)].collect().toMap
    assert(got == want)
  }

  test("gzip per-record members parse identically to the plain framing") {
    import java.io.ByteArrayOutputStream
    import java.util.zip.GZIPOutputStream
    val r1 = rec("resource", "u:1", "payload one".getBytes)
    val r2 = rec("resource", "u:2", "payload two!".getBytes)
    def gz(b: Array[Byte]) = {
      val bos = new ByteArrayOutputStream(); val g = new GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val plain = Warc.recordIterator("f", new ByteArrayInputStream(r1 ++ r2), 1 << 20)
      .map(r => (r.seq, r.url, new String(r.body))).toList
    val zipped = Warc.recordIterator("f",
      new ByteArrayInputStream(gz(r1) ++ gz(r2)), 1 << 20)
      .map(r => (r.seq, r.url, new String(r.body))).toList
    assert(plain == zipped && plain.size == 2)
  }

  // ------------------------------------------------------------- htmlToText

  private def extract(html: String): String = {
    Seq(html).toDF("h").select(TextKernels.htmlToText(col("h")).as("t"))
      .as[String].head()
  }

  test("htmlToText: scripts, styles, head, comments dropped wholesale") {
    val h = "<html><head><title>T</title><script>if (1<2) alert('x')</script>" +
      "<style>p { color: red }</style></head><body><p>kept</p><!-- gone --></body></html>"
    assert(extract(h) == "kept")
  }

  test("htmlToText: block closers separate words, inline tags vanish") {
    assert(extract("<p>one</p><p>two</p>") == "one two")
    assert(extract("con<b>cat</b>enated <i>italic</i> word") == "concatenated italic word")
    assert(extract("a<br>b<br/>c<hr>d") == "a b c d")
  }

  test("htmlToText: entities decode, unknown numerics become separators") {
    assert(extract("6 &gt; 5 &amp; 5 &lt; 6") == "6 > 5 & 5 < 6")
    assert(extract("it&#39;s &quot;quoted&quot;&nbsp;here") == "it's \"quoted\" here")
    assert(extract("star&#9733;gap") == "star gap")
  }

  test("htmlToText: whitespace collapses to single spaces, trimmed") {
    assert(extract("  <div>\n a \t b </div>\n") == "a b")
  }

  // ------------------------------------------------------------ fuzzing

  test("round-trip property: random binary payloads (CRLFs and WARC/ " +
    "magic inside) frame correctly — framing is length-based, not " +
    "delimiter-based") {
    val rnd = new scala.util.Random(42)
    val recs = (0 until 100).map { i =>
      val payload = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(payload)
      // plant adversarial content: record separators and header magic
      // inside payloads must not resync the framing
      if (payload.length > 20) {
        System.arraycopy("\r\n\r\nWARC/1.0\r\n".getBytes("ISO-8859-1"), 0,
          payload, rnd.nextInt(payload.length - 15), 14)
      }
      (s"u:$i", payload)
    }
    val bytes = recs.map { case (u, p) => rec("resource", u, p) }
      .reduce(_ ++ _)
    val got = Warc.recordIterator("f", new ByteArrayInputStream(bytes), 1 << 20).toList
    assert(got.size == 100)
    recs.zip(got).foreach { case ((u, p), r) =>
      assert(r.url == u && java.util.Arrays.equals(r.body, p))
    }
  }

  test("prefix property: every prefix of a valid stream degrades to the " +
    "fully-contained records, never throws") {
    val recs = (0 until 3).map(i => rec("resource", s"u:$i",
      s"payload number $i".getBytes))
    val bytes = recs.reduce(_ ++ _)
    val bounds = recs.scanLeft(0)(_ + _.length).tail // cumulative record ends
    for (len <- 0 to bytes.length) {
      val got = Warc.recordIterator("f",
        new ByteArrayInputStream(bytes.take(len)), 1 << 20).toList
      // a record parses iff its payload is fully present (its own trailing
      // separator may be cut — the next parse hits EOF instead)
      val fullyContained = bounds.count(b => len >= b - 4) // 4 = \r\n\r\n tail
      assert(got.size == fullyContained,
        s"prefix $len: got ${got.size}, want $fullyContained")
      got.zipWithIndex.foreach { case (r, i) => assert(r.url == s"u:$i") }
    }
  }

  test("garbage streams never throw: random bytes, gzip magic + garbage, " +
    "valid header + garbage length") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      val junk = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(junk)
      assert(Warc.recordIterator("f", new ByteArrayInputStream(junk), 1 << 20)
        .toList.isEmpty || true) // must not throw; content may be empty
    }
    val gzJunk = Array[Byte](0x1f, 0x8b.toByte) ++ Array.fill[Byte](60)(99)
    assert(Warc.recordIterator("f", new ByteArrayInputStream(gzJunk), 1 << 20)
      .toList.isEmpty)
    val badLen = "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: pony\r\n\r\nx"
    assert(Warc.recordIterator("f",
      new ByteArrayInputStream(badLen.getBytes("ISO-8859-1")), 1 << 20)
      .toList.isEmpty)
  }

  // ------------------------------------------------------- normalizeUrl

  private def norm(u: String): String =
    Seq(u).toDF("u").select(TextKernels.normalizeUrl(col("u")).as("n"))
      .as[String].head()

  test("normalizeUrl: case, default ports, fragments, trailing slash") {
    assert(norm("HTTP://ExAmple.COM:80/Path/To/") == "http://example.com/Path/To")
    assert(norm("https://a.example:443/x") == "https://a.example/x")
    assert(norm("https://a.example:8443/x#sec2") == "https://a.example:8443/x")
    assert(norm("http://a.example/") == "http://a.example/")
    assert(norm("http://a.example") == "http://a.example")
  }

  test("normalizeUrl: tracking params dropped, survivors sorted, empty query gone") {
    assert(norm("http://h/p?utm_source=x&b=2&a=1&fbclid=F") == "http://h/p?a=1&b=2")
    assert(norm("http://h/p?utm_campaign=c&gclid=g") == "http://h/p")
    assert(norm("http://h/p?z=1&y=2&z=0") == "http://h/p?y=2&z=0&z=1")
    assert(norm("http://h/p") == "http://h/p")
  }

  test("normalizeUrl is idempotent on its own output") {
    val urls = Seq("HTTP://ExAmple.COM:80/Path/To/?utm_source=x&b=2&a=1#f",
      "https://cdn.example.net:8443/docs/7?z=9", "http://h/p")
    urls.foreach(u => assert(norm(norm(u)) == norm(u)))
  }

  // ------------------------------------------------- crawl-to-corpus loop

  test("pagesStream -> curationStream: newly landed WARC files flow " +
    "through the quality gate and dedup into the accepted corpus; a " +
    "re-landed copy of a crawl file admits nothing") {
    import graft.streaming.StreamOps
    val tmp = java.nio.file.Files.createTempDirectory("graft-warc-stream")
    val landing = tmp.resolve("landing"); java.nio.file.Files.createDirectories(landing)
    val root = tmp.resolve("idx").toString
    val sink = tmp.resolve("accepted").toString

    def land(src: String, as: String): Unit =
      java.nio.file.Files.copy(java.nio.file.Paths.get(fixtureDir, src),
        landing.resolve(as))

    // first crawl output file lands before the stream starts
    land("sample-plain.warc", "crawl-00001.warc")
    val q = StreamOps.curationStream(
      graft.sources.Warc.pagesStream(spark, landing.toString),
      "url", "text", root, 0.8,
      length(col("text")) >= 40)(StreamOps.parquetSink(sink))
    try {
      q.processAllAvailable()
      // plain file: only p1 is an extractable 200 HTML page, and its prose
      // is 69 chars — past the gate
      val after1 = spark.read.parquet(sink).select("url")
        .as[String].collect().toSet
      assert(after1 == Set("https://a.example/p1"))

      // second crawl file: three more pages (p4/p5/p6 prose all >= 40
      // chars and mutually distinct), all admitted
      land("sample-gz.warc.gz", "crawl-00002.warc.gz")
      q.processAllAvailable()
      val after2 = spark.read.parquet(sink).select("url").as[String].collect().toSet
      assert(after2 == Set("https://a.example/p1", "https://b.example/p4",
        "https://b.example/p5", "https://b.example/p6"))

      // the corrupt-tail file's page p7 is 32 chars of prose — quality-
      // rejected; and a RE-LANDED copy of file 1 (new name, same content)
      // is exact-deduped against the accepted index: nothing admitted
      land("tail-garbage.warc", "crawl-00003.warc")
      land("sample-plain.warc", "crawl-00004.warc")
      q.processAllAvailable()
      val after3 = spark.read.parquet(sink).select("url").as[String].collect().toSeq
      assert(after3.sorted == after2.toSeq.sorted) // no growth, no dup rows
    } finally q.stop()
  }
}
