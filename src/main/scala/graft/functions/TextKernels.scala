package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernel library for large-scale training-data pipelines:
  * tokenization, shingling, portable MinHash signatures, SimHash
  * fingerprints, normalization and document fingerprinting.
  *
  * Everything is a pure Catalyst column expression (codegen-friendly, no
  * UDFs). Hashing is md5-based so that the DuckDB oracle can reproduce every
  * value bit-for-bit: both engines produce the identical 32-char hex digest
  * for the identical UTF-8 string, and lexicographic min over hex strings is
  * engine-independent. At production scale a 64/128-bit integer murmur hash
  * would be cheaper; the plan shape (shingle -> N signatures -> banded
  * buckets -> bucket join) is unchanged.
  */
object TextKernels {

  /** Whitespace word tokens, trimmed, non-empty, in document order
    * (duplicates preserved — needed for shingles and stats). */
  def wordTokens(s: Column): Column =
    filter(transform(split(s, " "), t => trim(t)), t => t =!= "")

  /** Distinct word 2-shingles ("w_i w_{i+1}"). Documents with fewer than two
    * tokens yield an empty set. */
  def wordShingles2(w: Column): Column =
    when(size(w) < 2, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(w) - 1),
        i => concat(element_at(w, i), lit(" "), element_at(w, i + 1)))))

  /** Per-shingle md5 digests — compute ONCE per row, then derive every
    * MinHash signature from it (16 md5s per shingle would be the naive
    * alternative; one digest is 16x cheaper and the 8-hex-char windows of a
    * single md5 are independent enough across shingles for LSH candidate
    * generation, which is exact-verified downstream anyway). */
  def shingleHashes(g: Column): Column = transform(g, x => md5(x))

  /** MinHash signature i over pre-computed shingle digests: lexicographic
    * min of the 8-char window starting at hex position i. Supports
    * i in [0, 24] for a 32-char md5. */
  def minhashSig(hv: Column, i: Int): Column =
    array_min(transform(hv, h => substring(h, i + 1, 8)))

  /** LSH band key: md5 of rowsPerBand consecutive signatures joined by '|'
    * (banded MinHash — candidate pairs must collide on at least one band). */
  def bandKey(sigs: Seq[Column], band: Int, rowsPerBand: Int): Column =
    md5(concat_ws("|", sigs.slice(band * rowsPerBand, (band + 1) * rowsPerBand): _*))

  /** 16-bit SimHash over a token array: bit j of each token's md5 is derived
    * from hex nibble j (>= 8 -> +1, else -1); fingerprint bit j is set when
    * the signed sum over tokens is positive. Integer arithmetic only —
    * bit-exact in any engine. */
  def simhash16(tokens: Column): Column = {
    val hs = transform(array_distinct(tokens), t => md5(t))
    val bits = (0 until 16).map { j =>
      val contrib = aggregate(hs, lit(0), (acc, h) =>
        acc + when(conv(substring(h, j + 1, 1), 16, 10).cast("int") >= 8, 1).otherwise(-1))
      when(contrib > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** 64-bit SimHash over a token array, returned as FOUR 16-bit band values
    * (array<int>, little-endian bit order within each band). Keeping the
    * bands separate serves both sides of the near-dup pipeline: each band is
    * directly an LSH bucket key (two fingerprints within hamming distance 3
    * must agree on at least one of the 4 bands — pigeonhole), and the full
    * hamming distance is the sum of per-band `bit_count(xor)`s without any
    * 64-bit sign gymnastics. Bit j of a token's contribution is bit
    * (j mod 4) of hex nibble (j div 4) of the token's md5 — integer
    * arithmetic only, bit-exact in any engine (the DuckDB oracle mirrors it
    * with instr/div/mod).
    *
    * The 64 signed bit-sums accumulate in ONE pass over the tokens (array
    * accumulator + zip_with); the band extraction lives in a separate
    * projection whose input is referenced 64 times, which CollapseProject
    * deliberately does not inline (non-cheap, multi-use) — so the aggregate
    * runs once per document, not once per bit. */
  def simhash64Sums(tokens: Column): Column = {
    val hs = transform(array_distinct(tokens), t => md5(t))
    // transform over the char array (split evaluated once per token — a
    // subtree referenced from N lambda sites would be re-evaluated N times,
    // as subexpression elimination does not reach inside lambda bodies)
    def contrib(h: Column): Column =
      flatten(transform(slice(split(h, ""), 1, 16), c => {
        val n = conv(c, 16, 10).cast("int")
        def bit(d: Int) = ((n / d).cast("int") % 2) * 2 - 1
        array(bit(1), bit(2), bit(4), bit(8))
      }))
    aggregate(hs, array_repeat(lit(0), 64), (acc, h) => zip_with(acc, contrib(h), (a, b) => a + b))
  }

  /** The 4 x 16-bit bands from the signed bit-sums of [[simhash64Sums]]:
    * band b bit j set when sums(16*b + j) > 0. */
  def simhash64Bands(sums: Column): Column =
    array((0 until 4).map { b =>
      (0 until 16).map { j =>
        when(element_at(sums, b * 16 + j + 1) > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)

  /** Canonical text normalization for fingerprinting: lower-case, collapse
    * every non-alphanumeric run to a single space, trim. */
  def normalizeText(s: Column): Column =
    trim(regexp_replace(lower(s), "[^a-z0-9]+", " "))

  /** Document fingerprint: md5 of the normalized text. */
  def fingerprint(s: Column): Column = md5(normalizeText(s))

  /** Word n-grams in document order ("w_i … w_{i+n-1}", space-joined).
    * Documents with fewer than n words yield an empty array — guarded
    * explicitly, because `sequence(1, 0)` DESCENDS in Spark and would
    * fabricate grams. */
  def wordNgrams(w: Column, n: Int): Column =
    when(size(w) < n, array().cast("array<string>")).otherwise(
      org.apache.spark.sql.functions.transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))

  /** Winnowing document fingerprints (the MOSS scheme, Schleimer et al.
    * SIGMOD'03), phase 1 of 2: hash every positional character k-gram;
    * [[winnowSelect]] then keeps the deduplicated MINIMUM hash of each
    * sliding window of `w` consecutive k-grams. Guarantees: any shared
    * substring of length >= k + w - 1 contributes at least one COMMON
    * selected fingerprint to both documents, and ~2/(w+1) of positions are
    * selected — so two documents sharing a long passage share many
    * fingerprints even when the rest of their text is unrelated. That is
    * PARTIAL-overlap detection: the containment case (a paragraph lifted
    * into an otherwise different document) that whole-document
    * fingerprints and set-Jaccard near-dup both dilute away.
    *
    * The hash is the first 12 hex chars of md5 as a 48-bit integer —
    * engine-portable exact arithmetic, no custom rolling polynomial whose
    * modular arithmetic each engine would have to reproduce. Documents
    * shorter than k characters yield an empty array (same descending-
    * `sequence` guard as [[wordNgrams]]).
    *
    * The two phases are deliberately NOT offered as one composed call:
    * keep this in its OWN projection (e.g.
    * `.select(winnowHashes(...).as("hv"))`) with a Generate (explode)
    * boundary before [[winnowSelect]] reads the column, the way
    * [[graft.operators.Dedup.winnowPairs]] does. A higher-order
    * `transform` lambda re-evaluates any non-attribute expression it
    * references on EVERY invocation, so composing the phases in one
    * expression makes the window pass re-hash the whole document per
    * window — O(n^2) md5 calls (measured 42 s vs 1.5 s at sf0.1); the
    * Generate above the projection keeps Catalyst from collapsing the two
    * back together. */
  def winnowHashes(text: Column, k: Int): Column = {
    val nGrams = length(text) - (k - 1)
    val grams = org.apache.spark.sql.functions.transform(
      sequence(lit(1), nGrams), i => text.substr(i, lit(k)))
    when(nGrams < 1, array().cast("array<bigint>"))
      .otherwise(org.apache.spark.sql.functions.transform(
        grams, g => conv(substring(md5(g), 1, 12), 16, 10).cast("long")))
  }

  /** Phase 2 of winnowing: the deduplicated per-window minima of a
    * MATERIALIZED hash-array column — never of an inline [[winnowHashes]]
    * expression (see the phase-1 scaladoc on the O(n^2) re-evaluation
    * trap). 1 <= grams < w keeps the single minimum of what exists, the
    * standard short-document degeneration. */
  def winnowSelect(hashes: Column, w: Int): Column = {
    val wins = org.apache.spark.sql.functions.transform(
      sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1))),
      i => array_min(slice(hashes, i, lit(w))))
    // explicit null passthrough: without it, size(null) is null, the < 1
    // guard falls through, and greatest(null, 1) = 1 fabricates ONE window
    // whose minimum is a null element — [null], not null
    when(hashes.isNull, lit(null).cast("array<bigint>"))
      .when(size(hashes) < 1, array().cast("array<bigint>"))
      .otherwise(array_distinct(wins))
  }

  /** [[winnowSelect]] keeping POSITIONS: per window, a struct of the
    * minimum hash and the 1-based character position of its k-gram (the
    * FIRST minimum when tied — deterministic), deduplicated on (fp, pos).
    * Positions are what turn shared-fingerprint counts into matched SPANS
    * (which passage was copied — [[graft.operators.Dedup.winnowSpans]]);
    * the same materialized-column contract as [[winnowSelect]] applies. */
  def winnowSelectPos(hashes: Column, w: Int): Column = {
    val wins = org.apache.spark.sql.functions.transform(
      sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1))),
      i => {
        val sl = slice(hashes, i, lit(w))
        val m = array_min(sl)
        struct(m.as("fp"),
          (i + array_position(sl, m) - 1).cast("int").as("pos"))
      })
    // same explicit null passthrough as winnowSelect
    when(hashes.isNull, lit(null).cast("array<struct<fp:bigint,pos:int>>"))
      .when(size(hashes) < 1, array().cast("array<struct<fp:bigint,pos:int>>"))
      .otherwise(array_distinct(wins))
  }

  /** Repetition-based quality signals (the classic corpus-filter rules:
    * templated/boilerplate documents repeat the same word pairs and
    * phrases far more than natural prose). Both are pure integer-ratio
    * doubles — engine-portable bit-for-bit — and run as narrow codegen'd
    * per-row maps: at 100 TB the cost is the per-row array work, no
    * shuffle, no join. */

  /** Fraction of word-bigram occurrences taken by the single most frequent
    * bigram. Natural prose stays low; templated text spikes. Documents with
    * fewer than 2 words score 0. Delegates to the native one-pass
    * hash-count kernel: the composed HOF form (filter-per-distinct-gram)
    * was QUADRATIC in document length — ~2 ms/doc on web-page text, the
    * single most expensive narrow map in the inventory — while the integer
    * counts (and so the emitted ratio) are identical. */
  def topBigramFraction(w: Column): Column = NativeKernels.topNgramFrac(w, 2)

  /** Fraction of word n-gram occurrences that are repeats of an earlier
    * n-gram (1 - distinct/total). Phrase-level self-plagiarism; documents
    * with fewer than n words score 0. Same native one-pass kernel. */
  def dupNgramFraction(w: Column, n: Int): Column =
    NativeKernels.dupNgramFrac(w, n)

  /** PII / pattern scrubbing. The patterns stay within the regex subset
    * that Java regex and RE2 (DuckDB) interpret identically — character
    * classes, alternation, + and ? — so scrub counts and masked text are
    * engine-portable. Both are codegen'd expressions; at corpus scale the
    * regex engine is the cost, not the plan (narrow per-row map). */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]+"
  val UrlPattern = "https?://[^ ]+"

  /** Number of non-overlapping matches of `pattern` in `s`. */
  def scrubCount(s: Column, pattern: String): Column =
    regexp_count(s, lit(pattern))

  /** `s` with every match of `pattern` masked by `repl`. */
  def scrub(s: Column, pattern: String, repl: String): Column =
    regexp_replace(s, pattern, repl)

  /** C0/C1-ish control characters that survive crawls and corrupt
    * training text — everything below 0x20 except '\t' (0x09) and '\n'
    * (0x0A), plus DEL (0x7F). Carriage returns are deliberately IN the
    * strip set: the line-based operators (line dedup, bullet/ellipsis
    * rules) key on bare '\n'. Shared by the Spark kernel and the oracle
    * (java.util.regex and RE2 both accept the hex class). */
  val ControlCharPattern = "[\\x00-\\x08\\x0B-\\x1F\\x7F]"

  /** The standard pre-tokenization cleaning pass: Unicode NFC composition
    * ([[graft.functions.NativeKernels.nfcNormalize]] — decomposed
    * é = e+U+0301 arrives from the web constantly and breaks every
    * hash/shingle/fingerprint downstream) followed by control-character
    * stripping ([[ControlCharPattern]]). Order is part of the contract
    * (NFC first), though the two commute: control characters are never
    * combining marks. */
  def cleanText(s: Column): Column =
    regexp_replace(graft.functions.NativeKernels.nfcNormalize(s),
      ControlCharPattern, "")

  /** The PII masking preset, ordered most-specific-first — the patterns a
    * crawl-curation pipeline masks before anything ships to training
    * (emails, card/SSN shapes, IPv4s, phone shapes). Deliberately limited
    * to syntax BOTH java.util.regex and RE2 accept (no lookaround, no
    * backrefs), so the DuckDB oracle replays the identical automaton.
    * Order matters and is part of the contract: emails go first (an IP
    * pattern could otherwise fire inside a dotted mail domain), card
    * numbers before phones (both are digit runs). A masking preset is
    * intentionally eager — a version string that looks like an IPv4 gets
    * masked; for training text that trade is correct. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{4}([ -]?\\d{4}){3}\\b" -> "<CARD>",
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "<SSN>",
    "\\+\\d{7,15}\\b|\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" -> "<PHONE>",
    "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b" -> "<IP>")

  /** `s` with every [[PiiPatterns]] match masked — [[scrub]] folded over
    * the preset in its declared order. */
  def scrubPii(s: Column): Column =
    PiiPatterns.foldLeft(s) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Query parameters that track campaigns/clicks, not content — two URLs
    * differing only in these are the same page. */
  val TrackingParamPattern =
    "^(utm_[^=]*|fbclid|gclid|msclkid|igshid|mc_eid|ref|ref_src)="

  /** Canonical form of a URL for crawl-level deduplication — the cheap
    * pre-content kill of re-crawls and tracking-link variants (every crawl
    * pipeline runs URL dedup BEFORE content dedup: it needs no page bytes
    * and collapses the bulk of exact re-fetches). Normalizations, each a
    * no-op on already-canonical URLs:
    *
    *  - drop the fragment (client-side only, never reaches the server);
    *  - lowercase the scheme and authority (host names are
    *    case-insensitive; paths are NOT touched);
    *  - drop explicit default ports (`http://…:80`, `https://…:443`);
    *  - drop a trailing slash on a non-root path;
    *  - drop tracking parameters ([[TrackingParamPattern]]) and sort the
    *    survivors, so parameter order doesn't split identical pages; an
    *    emptied query loses its `?`.
    *
    * Pure codegen'd column expressions (regex splits + array ops) — a
    * narrow per-row map, the same 100 TB posture as [[htmlToText]]. */
  def normalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // scheme://authority is everything before the first /?# past "://"
    val prefix = lower(regexp_extract(noFrag, "^([^:/?#]+://[^/?#]*)", 1))
    val rest = regexp_replace(noFrag, "^[^:/?#]+://[^/?#]*", "")
    val noPort = regexp_replace(
      regexp_replace(prefix, "^(http://[^/?#]*):80$", "$1"),
      "^(https://[^/?#]*):443$", "$1")
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val pathNorm = when(path === "/", path)
      .otherwise(regexp_replace(path, "/$", ""))
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamPattern)))
    val queryNorm = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(noPort, pathNorm, queryNorm)
  }

  /** The URL's host, lowercased, port and leading `www.` stripped — the
    * grouping key for per-domain pipeline policy (caps, mixing rates,
    * blocklists). Pure regex, same posture as [[normalizeUrl]]. */
  def urlHost(u: Column): Column =
    regexp_replace(lower(regexp_extract(u, "^[^:/?#]+://([^/?#:]+)", 1)),
      "^www\\.", "")

  /** Visible text of an HTML document — the C4/RefinedWeb-style extraction
    * step between WARC ingestion ([[graft.sources.Warc]]) and the text
    * pipeline (quality gate, language ID, dedup). Drops `<script>`,
    * `<style>`, `<head>`, and comment blocks wholesale (their contents are
    * code, not prose), strips the remaining tags, decodes the common named
    * and numeric character entities, and collapses whitespace. A pure
    * codegen'd `regexp_replace` chain — per-row map, no shuffle, no UDF;
    * at 100 TB the regex engine is the cost and the plan stays narrow.
    *
    * Block-drop patterns use a non-greedy body with an explicit closing
    * literal (no backreferences), so the chain behaves identically under
    * any regex engine that supports `(?is)`. */
  def htmlToText(html: Column): Column = {
    val noHead = regexp_replace(html, "(?is)<head[\\s>].*?</head\\s*>", " ")
    val noScript = regexp_replace(noHead, "(?is)<script[\\s>].*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[\\s>].*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    // Block-level closers become separators so "<p>a</p><p>b</p>" keeps a
    // word boundary; remaining (inline) tags are deleted outright so
    // "con<b>cat</b>enation" survives intact.
    val blockBreak = regexp_replace(noComment,
      "(?i)</(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote|section|article|header|footer)\\s*>|<(br|hr)\\s*/?\\s*>", " ")
    val noTag = regexp_replace(blockBreak, "(?s)<[^>]*>", "")
    // Entities: the common named + numeric forms decode to their character
    // (apostrophe/quote/angle numerics first, before the generic numeric
    // pass turns the rest into separators); bare `&amp;` decodes LAST so
    // no earlier pass can fabricate new entity-looking text.
    val named = Seq("#39" -> "'", "#x27" -> "'", "#34" -> "\"", "#x22" -> "\"",
      "nbsp" -> " ", "#160" -> " ", "lt" -> "<", "#60" -> "<",
      "gt" -> ">", "#62" -> ">", "quot" -> "\"", "apos" -> "'").foldLeft(noTag) {
      case (c, (e, r)) => regexp_replace(c, s"&$e;", r)
    }
    // Remaining numeric references (arbitrary code points — a regex cannot
    // compute the character) become separators rather than surviving as
    // markup noise in the extracted prose.
    val numeric = regexp_replace(named, "&#x?[0-9a-fA-F]{1,6};", " ")
    val amp = regexp_replace(numeric, "&amp;", "&")
    trim(regexp_replace(amp, "\\s+", " "))
  }
}
