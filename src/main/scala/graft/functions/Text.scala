package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis function library for the training-data pipeline
  * extensions (builder brief; SURVEY §2.11 extension slots): tokenizing,
  * shingling, language-ID scoring, quality scoring, fingerprinting,
  * MinHash/SimHash signatures.
  *
  * Everything is a pure `Column` expression tree — codegen'd, no UDFs,
  * no driver-side work — so each scales linearly over a 100 TB corpus
  * with zero shuffle until an explicit groupBy/join.
  */
object Text {

  /** Whitespace word count via length arithmetic (oracle-parity form:
    * identical semantics are expressible in ANSI SQL). Counts
    * single-space-separated words; empty string → 0. */
  def wordCount(c: Column): Column =
    when(length(c) === 0, lit(0L))
      .otherwise((length(c) - length(regexp_replace(c, " ", ""))).cast("long") + 1L)

  /** Whitespace tokens (split on runs of whitespace). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** The ranges this engine treats as "CJK writes without word
    * spaces": Hiragana+Katakana (U+3040–30FF), CJK Ext A
    * (U+3400–4DBF), Unified Ideographs (U+4E00–9FFF), Compatibility
    * Ideographs (U+F900–FAFF), plus the SUPPLEMENTARY ideographic
    * planes U+20000–U+3FFFF (planes 2–3 — Ext B through H and the
    * compatibility supplement; Unicode dedicates both planes to
    * ideographs, so the whole-plane test is exact enough and one
    * compare). Hangul is NOT included (Korean is space-delimited).
    * Supplementary chars are surrogate PAIRS in JVM strings — the
    * char-side kernel must walk code points ([[isCjk(cp:Int)*]]), and
    * regex engines handle the pair atomically. ONE definition: the
    * Column regex, the JVM kernel (BpeEncode's split), and every
    * oracle's RE2 class (`\x{3040}-…`) must describe the same set or
    * fit/encode/oracle segmentations drift. */
  val CjkRegexClass: String =
    "[\\u3040-\\u30FF\\u3400-\\u4DBF\\u4E00-\\u9FFF\\uF900-\\uFAFF" +
      "\\x{20000}-\\x{3FFFF}]"

  /** The same set, code-point-side — shared with
    * [[graft.expressions.BpeEncode]]. One leading compare rejects all
    * of Latin (every range starts at or above U+3040): this test runs
    * per character in the encode scan, so the common-script fast path
    * matters at corpus scale. */
  def isCjk(cp: Int): Boolean =
    cp >= 0x3040 && (cp <= 0x30FF ||
      (cp >= 0x3400 && cp <= 0x4DBF) ||
      (cp >= 0x4E00 && cp <= 0x9FFF) ||
      (cp >= 0xF900 && cp <= 0xFAFF) ||
      (cp >= 0x20000 && cp <= 0x3FFFF))

  /** BMP-char convenience overload; a surrogate half is never CJK by
    * itself — callers that may see supplementary text must walk code
    * points and use the Int form. */
  def isCjk(ch: Char): Boolean = isCjk(ch.toInt)

  /** CJK pre-split: a space around every CJK char, so the whitespace
    * word convention yields ONE WORD PER IDEOGRAPH on scripts that
    * write without spaces — the standard char-level fallback for
    * quality stats and tokenizer fitting on multilingual corpora
    * (word-frequency heads, Gopher word stats and boilerplate
    * segments all degenerate to whole-clause "words" otherwise).
    * Identity on space-delimited text, so Latin-corpus results are
    * byte-identical with or without it. Replayable in ANSI SQL:
    * `regexp_replace(t, '([\x{3040}-\x{30FF}…])', ' \1 ', 'g')`. */
  def cjkPreSplit(c: Column): Column =
    regexp_replace(c, s"($CjkRegexClass)", " $1 ")

  /** [[tokens]] under the CJK char-level fallback. */
  def tokensCjk(c: Column): Column = tokens(cjkPreSplit(c))

  /** [[segments]] under the CJK char-level fallback. */
  def segmentsCjk(c: Column, segWords: Int): Column =
    segments(cjkPreSplit(c), segWords)

  /** BPE-ish subword-boundary token count: words + digits + punctuation
    * as separate tokens (GPT-2-style pre-tokenizer shape, simplified). */
  def bpeishTokens(c: Column): Column =
    filter(split(c, """(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])"""), t => t =!= "" && t =!= " ")

  /** Word n-gram shingles: contiguous n-word windows joined by a space.
    * Documents shorter than n words yield the whole doc as one shingle. */
  def shingles(c: Column, n: Int): Column = {
    val w = tokens(c)
    when(size(w) <= n, array(concat_ws(" ", w)))
      .otherwise(transform(
        sequence(lit(1), size(w) - lit(n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
  }

  /** Non-overlapping fixed-size word segments: words grouped into
    * consecutive `segWords`-word windows joined by a space (the last
    * segment shorter). Deterministic segmentation both engines can
    * replay: segment i covers words [i·segWords+1, (i+1)·segWords].
    * A text of W words yields ⌈W/segWords⌉ segments (W=0 still yields
    * one empty segment — `split` of an empty string is `[""]`, same
    * as ANSI `regexp_split_to_array`). */
  def segments(c: Column, segWords: Int): Column = {
    require(segWords > 0, s"segments needs segWords > 0, got $segWords")
    val w = tokens(c)
    transform(
      sequence(lit(0L), floor((size(w) - lit(1)) / lit(segWords))),
      i => concat_ws(" ", slice(w, (i * segWords + 1).cast("int"), lit(segWords))))
  }

  /** Occurrences of a literal marker substring (length arithmetic —
    * ANSI-expressible, deterministic; plain `replace`, not a regex —
    * the marker-count family evaluates ~27 of these per doc). */
  def markerCount(c: Column, marker: String): Column =
    ((length(c) - length(replace(c, lit(marker), lit("")))) /
      lit(marker.length)).cast("long")

  /** Language-ID heuristic: argmax over per-language marker-word hit
    * counts, ties and all-zero broken toward English. The marker sets are
    * function-word n-grams; the scoring is exactly reproducible in SQL. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " y "),
    "zh" -> Seq("的", "是", "了"),
  )

  def langScore(c: Column, lang: String): Column =
    langMarkers.toMap.apply(lang).map(m => markerCount(c, m)).reduce(_ + _)

  /** Predicted language = first language (in langMarkers order) with the
    * maximal marker score; "und" when every score is zero. */
  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(c, l) }
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((l, s), e) =>
      when(s === maxScore && maxScore > 0, lit(l)).otherwise(e)
    }
    pick
  }

  /** Quality metrics (heuristic quality scoring per builder brief):
    * chars, words, mean word length, punctuation ratio, stopword ratio.
    * All length-arithmetic — oracle-parity safe. */
  def punctCount(c: Column): Column =
    Seq(".", ",", "!", "?", ";", ":").map(markerCount(c, _)).reduce(_ + _)

  def stopwordCount(c: Column): Column =
    Seq(" the ", " a ", " and ", " of ", " to ", " in ")
      .map(markerCount(c, _)).reduce(_ + _)

  /** Composite quality score in [0,1]: penalize too-short docs, reward
    * stopword presence, penalize punctuation soup. Deterministic double
    * arithmetic (single expression, no reordering). */
  def qualityScore(c: Column): Column = {
    val chars = length(c).cast("double")
    val words = wordCount(c).cast("double")
    val lenScore  = least(chars / lit(400.0), lit(1.0))
    val stopScore = least(stopwordCount(c).cast("double") * lit(8.0) / greatest(words, lit(1.0)), lit(1.0))
    val punctPen  = least(punctCount(c).cast("double") * lit(4.0) / greatest(chars, lit(1.0)), lit(1.0))
    round(lit(0.5) * lenScore + lit(0.5) * stopScore - lit(0.25) * punctPen, 6)
  }

  /** Normalized-content fingerprint: lowercase, strip [.,!?;:], collapse
    * runs of spaces, md5. Two docs differing only in case/punct/spacing
    * collide — the canonical "document fingerprint" dedup key. */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(
      regexp_replace(lower(c), "[.,!?;:]", ""),
      " +", " "))

  /** 64-bit rolling (polynomial) hash of the normalized text, base 31
    * over UTF-8 bytes of each token, combined left-to-right. Cheap
    * near-exact dedup key that is order-sensitive. */
  def rollingHash(c: Column): Column =
    aggregate(tokens(c), lit(0L), (acc, t) => acc * lit(1000003L) + xxhash64(t))

  /** MinHash signature: array of `k` minima over the doc's `n`-word
    * shingles, permutation i being a universal-hash mix
    * `a_i * xxhash64(shingle) + b_i` (odd multiplier per i). Empty docs
    * get Long.MaxValue entries.
    *
    * Two deliberate shapes for scale: each shingle string is hashed
    * exactly ONCE (the k permutations are integer mixes of that one
    * hash — k string-hashes per shingle is ~10× slower), and the whole
    * signature is a single fold over the shingle array (re-evaluating
    * the shingling per permutation is ~60× slower). Long overflow wraps
    * (non-ANSI), which is exactly what a hash mix wants. */
  def minHashSignature(c: Column, k: Int, shingleN: Int = 3): Column =
    aggregate(
      transform(shingles(c, shingleN), s => xxhash64(s)),
      array_repeat(lit(Long.MaxValue), k),
      (acc, h) => zip_with(acc, sequence(lit(0L), lit(k - 1L)),
        (m, i) => least(m, h * (i * lit(2L) + lit(1L)) + i * lit(-7046029254386353131L))))

  /** LSH band keys for a minhash signature: `bands` hashes, each over
    * `rowsPerBand` consecutive signature entries. Docs sharing any band
    * key become dedup candidates. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*)
    }: _*)

  /** SimHash (64-bit) over whitespace tokens: per-token xxhash64, each
    * bit votes ±1, signature bit = sign of the vote sum. One pass over
    * the token hashes (array-accumulator fold); bit tests via `getbit`
    * so the whole thing stays a codegen'd expression tree. */
  def simHash(c: Column): Column = {
    val hashes = transform(tokens(c), t => xxhash64(t))
    // votes[i] = sum over tokens of (bit i set ? 1 : -1)
    val votes = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, i) => a + when(getbit(h, i) === 1, 1).otherwise(-1)))
    // LSB-first sign bits -> one long, folding MSB-first: acc*2 + bit
    // (top bit wraps into the sign bit, java-long semantics)
    aggregate(
      reverse(transform(votes, v => when(v > 0, lit(1L)).otherwise(lit(0L)))),
      lit(0L),
      (acc, b) => acc * lit(2L) + b)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Strip HTML/XML tags and collapse the leftover whitespace. */
  def stripHtml(c: Column): Column =
    regexp_replace(regexp_replace(c, "<[^>]*>", " "), " +", " ")

  /** Scrub common PII spans (emails, then phone-number-ish digit runs,
    * then IPv4 addresses — in that order) with typed placeholders.
    * Patterns use syntax valid in both Java regex and RE2. */
  def scrubPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>")
    val ip = regexp_replace(email,
      "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>")
    regexp_replace(ip,
      "\\+?[0-9][0-9 ()-]{7,}[0-9]", "<PHONE>")
  }
}
