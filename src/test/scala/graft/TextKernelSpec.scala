package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextKernels._

class TextKernelSpec extends SparkTestBase {

  private def eval1(c: Column): Any = spark.range(1).select(c.as("r")).head.get(0)

  test("wordTokens: splits, trims, keeps duplicates and order") {
    assert(eval1(wordTokens(lit("the  quick the fox "))) == Seq("the", "quick", "the", "fox"))
  }

  test("wordShingles2: fewer than two tokens -> empty; adjacent pairs; distinct") {
    assert(eval1(wordShingles2(wordTokens(lit("solo")))) == Seq())
    assert(eval1(wordShingles2(wordTokens(lit("")))) == Seq())
    assert(eval1(wordShingles2(wordTokens(lit("a b c a b")))) ==
      Seq("a b", "b c", "c a"))
  }

  test("simhash16: 16-bit range, deterministic, equal input -> equal hash") {
    val h1 = eval1(simhash16(wordTokens(lit("spark join stream")))).asInstanceOf[Long]
    val h2 = eval1(simhash16(wordTokens(lit("spark join stream")))).asInstanceOf[Long]
    val h3 = eval1(simhash16(wordTokens(lit("completely different words here")))).asInstanceOf[Long]
    assert(h1 == h2)
    assert(h1 >= 0L && h1 < 65536L && h3 >= 0L && h3 < 65536L)
    assert(h1 != h3) // distinct texts give distinct hashes (no collision for this pair)
  }

  test("simhash16: near-identical texts have small hamming distance") {
    val h1 = eval1(simhash16(wordTokens(lit("alpha beta gamma delta epsilon zeta eta theta")))).asInstanceOf[Long]
    val h2 = eval1(simhash16(wordTokens(lit("alpha beta gamma delta epsilon zeta eta iota")))).asInstanceOf[Long]
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 6)
  }

  test("simhash64: four 16-bit bands, deterministic, near texts -> small hamming") {
    def bands(text: String): Seq[Int] =
      eval1(simhash64Bands(simhash64Sums(wordTokens(lit(text)))))
        .asInstanceOf[scala.collection.Seq[Int]].toSeq
    def hamming(x: Seq[Int], y: Seq[Int]): Int =
      x.zip(y).map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    val b1 = bands("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val b2 = bands("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val b3 = bands("alpha beta gamma delta epsilon zeta eta theta iota lambda")
    val b4 = bands("utterly disjoint vocabulary chosen for maximal difference everywhere")
    assert(b1.size == 4 && b1.forall(v => v >= 0 && v < 65536))
    assert(hamming(b1, b2) == 0)          // deterministic
    assert(hamming(b1, b3) < hamming(b1, b4)) // one-token edit ≪ disjoint text
  }

  test("normalizeText / fingerprint: canonicalization and idempotence") {
    assert(eval1(normalizeText(lit("  Hello,   WORLD!! 42  "))) == "hello world 42")
    val f1 = eval1(fingerprint(lit("Hello, world!")))
    val f2 = eval1(fingerprint(lit("hello WORLD")))
    assert(f1 == f2) // same normalized form
    assert(f1.asInstanceOf[String].length == 32)
  }

  test("repetition signals: wordNgrams guards short docs, fractions match " +
    "hand-computed values") {
    // "a b a b a b": bigrams [a b, b a, a b, b a, a b] -> top "a b" = 3/5;
    // 5-grams [a b a b a, b a b a b] -> all distinct -> dup 0
    val w1 = wordTokens(lit("a b a b a b"))
    assert(eval1(topBigramFraction(w1)) == 0.6)
    assert(eval1(dupNgramFraction(w1, 5)) == 0.0)
    // "x x x x x x": bigrams 5 x "x x" -> top 1.0; 5-grams [xxxxx, xxxxx]
    // -> 1 distinct of 2 -> dup 0.5
    val w2 = wordTokens(lit("x x x x x x"))
    assert(eval1(topBigramFraction(w2)) == 1.0)
    assert(eval1(dupNgramFraction(w2, 5)) == 0.5)
    // short docs: sequence(1, 0) would DESCEND and fabricate grams — the
    // guard must yield empty grams and 0 fractions
    assert(eval1(wordNgrams(wordTokens(lit("solo")), 2)) == Seq.empty)
    assert(eval1(topBigramFraction(wordTokens(lit("solo")))) == 0.0)
    assert(eval1(dupNgramFraction(wordTokens(lit("a b c")), 5)) == 0.0)
    assert(eval1(wordNgrams(wordTokens(lit("a b c")), 3)) == Seq("a b c"))
  }

  test("minhashSig: identical shingle sets give identical signatures") {
    val g1 = shingleHashes(wordShingles2(wordTokens(lit("a b c d e"))))
    val g2 = shingleHashes(wordShingles2(wordTokens(lit("a b c d e"))))
    (0 until 4).foreach { i =>
      assert(eval1(minhashSig(g1, i)) == eval1(minhashSig(g2, i)))
    }
    // different hash windows give (almost surely) different signatures
    assert(eval1(minhashSig(g1, 0)) != eval1(minhashSig(g1, 1)))
    // every signature is an 8-hex-char window
    assert(eval1(minhashSig(g1, 3)).asInstanceOf[String].length == 8)
  }

  test("scrubPii: each preset shape masks; order protects the mail domain " +
    "from the IP pattern; clean text passes through untouched") {
    def scrub(s: String): String =
      eval1(graft.functions.TextKernels.scrubPii(lit(s))).asInstanceOf[String]
    assert(scrub("mail me at jane.doe+x@sub.example.org now") ==
      "mail me at <EMAIL> now")
    assert(scrub("card 4111 1111 1111 1111 or 4111-1111-1111-1111") ==
      "card <CARD> or <CARD>")
    assert(scrub("ssn 123-45-6789.") == "ssn <SSN>.")
    assert(scrub("call 555-123-4567 or +442071234567 today") ==
      "call <PHONE> or <PHONE> today")
    assert(scrub("host 192.168.0.1 answered") == "host <IP> answered")
    // email first: a digit-heavy local/user part must not leak an IP mask
    // into the middle of a masked address
    assert(scrub("from 10.20.30.40@mail.example.com sent") ==
      "from <EMAIL> sent")
    assert(scrub("no pii here, just words") == "no pii here, just words")
  }
}
