package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE training and encoding: the textbook merge sequence, rank-priority
  * encoding, determinism, and the distributed word-count path. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // the classic Sennrich corpus: low x5, lower x2, newest x6, widest x3
  private val counts = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainFromCounts learns the textbook merge sequence with " +
    "lexicographic tie-breaks") {
    val merges = Bpe.trainFromCounts(counts, 5)
    // pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9 tie -> ("e","s")
    // wins lexicographically; then (es,t), (est,</w>); then the (l,o)/(o,w)
    // 7-tie resolves to (l,o), then (lo,w)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndMark),
      ("l", "o"), ("lo", "w")))
  }

  test("training stops when no pair repeats, and is deterministic") {
    // every word distinct, every pair count 1 -> nothing to merge
    assert(Bpe.trainFromCounts(Seq(("ab", 1L), ("cd", 1L)), 10).isEmpty)
    val a = Bpe.trainFromCounts(counts, 50)
    val b = Bpe.trainFromCounts(counts, 50)
    assert(a == b)
    // asking past the useful merges returns what exists, without looping
    assert(a.size < 50)
  }

  test("encodeWord applies merges by rank priority (GPT-2 procedure)") {
    val merges = Bpe.trainFromCounts(counts, 5)
    val ranks = merges.zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", ranks) == Seq("low", "est" + Bpe.EndMark))
    assert(Bpe.encodeWord("newest", ranks) ==
      Seq("n", "e", "w", "est" + Bpe.EndMark))
    // unseen characters stay as singleton symbols
    assert(Bpe.encodeWord("xy", ranks) == Seq("x", "y", Bpe.EndMark))
    assert(Bpe.encodeWord("", ranks).isEmpty)
    // symbols are CODE POINTS: a surrogate-pair emoji stays one symbol
    // (a UTF-16 split would emit two invalid half-characters)
    assert(Bpe.encodeWord("a😀b", ranks) ==
      Seq("a", "😀", "b", Bpe.EndMark))
    // and merges learned over such symbols treat the emoji whole: training
    // to exhaustion on an emoji-only vocabulary produces merges whose
    // parts are valid strings (never a lone surrogate)
    val emojiMerges = Bpe.trainFromCounts(Seq(("😀🚀", 5L), ("😀🎉", 3L)), 10)
    assert(emojiMerges.nonEmpty)
    emojiMerges.foreach { case (a, b) =>
      // canEncode rejects lone surrogates — the UTF-16-split failure mode
      val enc = java.nio.charset.StandardCharsets.UTF_8.newEncoder()
      assert(enc.canEncode(a) && enc.canEncode(b),
        s"merge ($a, $b) holds an invalid string")
    }
  }

  test("tokens column encodes each word in order; tokenCount sizes it; " +
    "null text stays null") {
    val merges = Bpe.trainFromCounts(counts, 5)
    val df = Seq((1L, "lowest newest"), (2L, ""), (3L, null: String))
      .toDF("id", "text")
    val w = graft.functions.TextKernels.wordTokens(col("text"))
    val got = df.select(col("id"), Bpe.tokens(w, merges).as("t"),
        Bpe.tokenCount(w, merges).as("n"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getSeq[String](1).toSeq),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got(1L)._1 == Seq("low", "est" + Bpe.EndMark,
      "n", "e", "w", "est" + Bpe.EndMark) && got(1L)._2 == 6L)
    assert(got(2L)._1 == Seq.empty && got(2L)._2 == 0L)
    assert(got(3L)._1 == null && got(3L)._2 == -1L)
  }

  test("tokens kernel == driver-side encodeWord on random words (memo on " +
    "and past its clear threshold both exercised)") {
    val rnd = new scala.util.Random(131)
    val alphabet = "abcde"
    val words = (0 until 400).map(_ =>
      (0 until (1 + rnd.nextInt(8))).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val docs = words.grouped(8).map(_.mkString(" ")).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val merges = Bpe.trainFromCounts(
      words.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
        .sortBy(_._1), 30)
    assert(merges.nonEmpty)
    val ranks = merges.zipWithIndex.toMap
    val df = docs.toDF("id", "text")
    val w = graft.functions.TextKernels.wordTokens(col("text"))
    val got = df.select(col("id"), Bpe.tokens(w, merges).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    docs.foreach { case (i, t) =>
      val expected = t.split(" ").filter(_.nonEmpty)
        .flatMap(word => Bpe.encodeWord(word, ranks)).toSeq
      assert(got(i) == expected, s"doc $i: ${got(i)} != $expected")
    }
  }

  test("distributed train == trainFromCounts of the same word counts") {
    val docs = Seq(
      "low low low low low lower lower",
      "newest newest newest widest widest",
      "newest newest newest widest").toDF("text")
    val w = graft.functions.TextKernels.wordTokens(col("text"))
    val dist = Bpe.train(docs, w, 5)
    assert(dist == Bpe.trainFromCounts(counts, 5))
    // maxWords caps the training vocabulary deterministically: with only
    // the 2 most frequent words (newest x6, low x5) the suffix merges
    // reflect that reduced table
    val capped = Bpe.train(docs, w, 3, maxWords = 2)
    assert(capped == Bpe.trainFromCounts(Seq(("newest", 6L), ("low", 5L)), 3))
  }

  test("save/load round-trips a merge table (rank order, unicode symbols) " +
    "and the loaded model encodes identically; kind mismatch fails fast") {
    // unicode words exercise code-point symbols surviving parquet
    val merges = Bpe.trainFromCounts(
      counts :+ ("😀na😀na", 4L), 12)
    assert(merges.nonEmpty)
    val path = java.nio.file.Files.createTempDirectory("graft-bpe")
      .toString + "/model"
    Bpe.save(spark, merges, path)
    assert(Bpe.load(spark, path) == merges)
    // encodings through the persisted model are identical to the in-memory
    // model's, including on words never seen in training
    val df = Seq((1L, "lowest newest 😀na"), (2L, "widest low"))
      .toDF("id", "text")
    val w = graft.functions.TextKernels.wordTokens(col("text"))
    def enc(m: Seq[(String, String)]) =
      df.select(col("id"), Bpe.tokens(w, m).as("t"))
        .as[(Long, Seq[String])].collect().toMap
    assert(enc(Bpe.load(spark, path)) == enc(merges))
    // the sidecar records the model shape
    val meta = graft.operators.IndexIO.readMeta(spark, path).get
    assert(meta.path("kind").asText() == "bpe")
    assert(meta.path("merges").asInt() == merges.size)
    // probing a non-bpe sidecar as a merge table fails fast
    val wrong = java.nio.file.Files.createTempDirectory("graft-bpe2")
      .toString + "/notbpe"
    Seq((1L, 0.5)).toDF("t", "w").write.parquet(wrong)
    graft.operators.IndexIO.writeMeta(spark, wrong, """{"kind":"lsh"}""")
    intercept[IllegalArgumentException] { Bpe.load(spark, wrong) }
    intercept[IllegalArgumentException] {
      Bpe.load(spark, wrong + "-missing")
    }
  }

  test("minPairCount threads through: 1 merges singleton pairs down the " +
    "tail; the default 2 (subword-nmt --min-frequency parity) stops at them") {
    // every pair occurs once -> the default (= Sennrich's learn_bpe
    // default) learns nothing; minPairCount=1 merges the singletons
    // deterministically
    val singles = Seq(("ab", 1L), ("cd", 1L))
    assert(Bpe.trainFromCounts(singles, 4).isEmpty)
    val parity = Bpe.trainFromCounts(singles, 4, minPairCount = 1L)
    // ties at count 1 resolve lexicographically: (a,b) then (ab,</w>) ...
    assert(parity == Seq(("a", "b"), ("ab", Bpe.EndMark),
      ("c", "d"), ("cd", Bpe.EndMark)))
    // the distributed train threads the knob through
    val df = Seq("ab cd").toDF("text")
    val w = graft.functions.TextKernels.wordTokens(col("text"))
    assert(Bpe.train(df, w, 4, minPairCount = 1L) == parity)
  }
}
