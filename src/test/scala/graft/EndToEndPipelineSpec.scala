package graft

import org.apache.spark.sql.functions._

import graft.functions.TextKernels
import graft.operators.{Contamination, Dedup, Packing, Sampling}

/** Capstone integration: the whole crawl-to-corpus pipeline composed from
  * the operators this library ships — WARC capture -> HTML extraction ->
  * URL dedup -> per-domain cap -> quality gate + exact/near-dup curation
  * (the real admit loop, against persisted indexes, with the exactly-once
  * sink) -> decontamination -> token-budget selection -> chunking -> a
  * size-targeted sharded corpus. Every stage must do real work on this
  * corpus (each kill-path has planted victims), the final survivor set is
  * asserted exactly, and the WHOLE pipeline must be deterministic: running
  * it twice yields bit-identical corpus contents. */
class EndToEndPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def warcRecord(url: String, html: String): Array[Byte] = {
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
      .getBytes("UTF-8")
    val head = s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    head.getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def article(tag: String): String =
    (1 to 30).map(i => s"${tag}word$i").mkString(
      s"<html><body><p>article $tag begins ", " ", s" and $tag ends</p></body></html>")

  test("crawl-to-corpus: WARC -> pages -> URL dedup -> domain cap -> " +
    "curation -> decontamination -> budget -> chunks -> sharded corpus, " +
    "deterministically") {
    val root = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val crawl = new java.io.File(s"$root/crawl"); crawl.mkdirs()
    val bytes = new java.io.ByteArrayOutputStream()
    // 8 distinct articles on their own domains
    (1 to 8).foreach(i =>
      bytes.write(warcRecord(s"https://site$i.example/a$i", article(s"a$i"))))
    // URL-dedup victims: two tracking-link variants of article 1's page
    bytes.write(warcRecord("https://site1.example/a1?utm_source=x", article("a1")))
    bytes.write(warcRecord("https://SITE1.example/a1", article("a1")))
    // exact-dup victim: article 3's content re-hosted at a new URL
    bytes.write(warcRecord("https://copy.example/steal3", article("a3")))
    // near-dup victim: article 4 with one word changed, new URL
    bytes.write(warcRecord("https://close.example/steal4",
      article("a4").replace("a4word17", "changed")))
    // quality victims: three junk pages, too short to clear the gate
    (1 to 3).foreach(i =>
      bytes.write(warcRecord(s"https://junk$i.example/j$i",
        s"<html><body>tiny $i</body></html>")))
    // domain-domination victims: six distinct articles on ONE mirror host
    (1 to 6).foreach(i =>
      bytes.write(warcRecord(s"https://mirror.example/m$i", article(s"m$i"))))
    // a benchmark-contaminated page: mostly the eval text, new vocabulary tail
    bytes.write(warcRecord("https://leak.example/eval",
      (1 to 30).map(i => s"evalword$i").mkString(
        "<html><body><p>", " ", "</p></body></html>")))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/crawl/seg0.warc"), bytes.toByteArray)

    val evalSet = Seq((1 to 30).map(i => s"evalword$i").mkString(" ")).toDF("etext")

    /** The full pipeline, parameterized by a run directory so the
      * determinism check can execute it twice in isolation. */
    def run(runDir: String): Seq[(String, String)] = {
      // 1. capture -> visible text
      val pages = graft.sources.Warc.pages(spark, s"$root/crawl/*.warc")
      // 2. canonical-URL dedup (tracking variants collapse; keeper = min url)
      val canon = pages
        .withColumn("url_norm", TextKernels.normalizeUrl(col("url")))
        .groupBy("url_norm").agg(min(col("url")).as("url"), first("text").as("text"))
      // 3. per-domain cap: no host contributes more than 3 documents
      val capped = Sampling.capPerKey(canon, TextKernels.urlHost(col("url")),
        col("url_norm"), 3L)
      // 4. the admit loop: quality gate -> exact dedup -> near-dup dedup,
      //    against persisted accepted-corpus indexes, exactly-once sink.
      //    Ids must be stable and orderable: the url hash
      val docs = capped.select(xxhash64(col("url_norm")).as("doc_id"),
        col("url"), col("text"))
      val accepted = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, String)]]
      graft.streaming.StreamOps.curationBatch(docs, 0L, "doc_id", "text",
        s"$runDir/idx", 0.8,
        size(graft.functions.NativeKernels.wordTokens(col("text"))) >= 15,
        (acc, _) => accepted += acc.select("doc_id", "url", "text")
          .as[(Long, String, String)].collect().toSeq)
      val admitted = accepted.flatten.toSeq.toDF("doc_id", "url", "text")
      // 5. benchmark decontamination against the separate eval table
      val sh = graft.functions.NativeKernels.wordShingles2(col("text"))
      val esh = TextKernels.wordShingles2(TextKernels.wordTokens(col("etext")))
      val clean = Contamination.decontaminateAgainst(admitted, col("doc_id"),
        sh, evalSet, esh, 0.5)
      // 6. token-budget selection, quality = token count (all docs fit here;
      //    the stage still exercises the ordered prefix machinery)
      val toks = size(graft.functions.NativeKernels.wordTokens(col("text")))
      val kept = Packing.budgetSelect(clean, col("doc_id"), toks,
        toks.cast("double"), budget = 100000L)
      val corpus = clean.join(kept.select(col("id").as("doc_id")), "doc_id")
      // 7. chunk for training and ship as a sharded corpus
      val chunks = Packing.chunkTokens(
        corpus.select(col("doc_id"),
          graft.functions.NativeKernels.wordTokens(col("text")).as("w")),
        col("doc_id"), col("w"), 16, 2)
      graft.engine.OutputWriter.writeSharded(
        corpus.select(col("url"), col("text")), s"$runDir/corpus",
        targetBytes = 4096)
      assert(chunks.count() > corpus.count(), "multi-chunk docs expected")
      spark.read.parquet(s"$runDir/corpus")
        .as[(String, String)].collect().toSeq.sorted
    }

    val out = run(s"$root/run1")
    val urls = out.map(_._1).toSet
    val lower = urls.map(_.toLowerCase)
    // independent articles 2, 5, 6, 7, 8 survive untouched
    Seq(2, 5, 6, 7, 8).foreach(i =>
      assert(lower.contains(s"https://site$i.example/a$i"),
        s"article a$i missing from $urls"))
    // the three URL variants of article 1 collapsed to ONE canonical page
    assert(!urls.exists(_.contains("utm_source")))
    assert(lower.count(_.contains("site1.example")) == 1)
    // each content-duplicate class kept exactly ONE representative (the
    // min-id keeper — deterministic, but either member may hold it)
    assert(lower.count(u => u.contains("site3.example") ||
      u.contains("copy.example")) == 1, s"a3 class wrong in $urls")
    assert(lower.count(u => u.contains("site4.example") ||
      u.contains("close.example")) == 1, s"a4 class wrong in $urls")
    // junk failed the gate; the eval leak was decontaminated
    assert(!urls.exists(_.contains("junk")))
    assert(!urls.exists(_.contains("leak.example")))
    // the mirror host was capped to 3 of its 6 pages
    assert(urls.count(_.contains("mirror.example")) == 3)
    assert(out.size == 11) // 8 article classes + 3 capped mirror pages
    // the whole pipeline is deterministic: a second run from scratch
    // produces bit-identical corpus contents
    assert(run(s"$root/run2") == out)
  }
}
