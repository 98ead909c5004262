package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup signatures.
  *
  * The HOF formulations (graft.functions.Text) are correct but pay a
  * boxed lambda invocation per (shingle × permutation) — at 64
  * permutations that is tens of millions of megamorphic calls per
  * partition. These expressions do the same math in primitive JVM
  * loops over the row's UTF-8 bytes: one tokenizer pass, one hash per
  * shingle, k integer mixes. Same operator semantics, ~5-10× faster at
  * bench scale; `CodegenFallback` only wraps the per-row call — inputs
  * and outputs stay inside whole-stage codegen.
  */
private[graft] object Hashing {
  /** 64-bit hash of a shingle given pre-tokenized words [from, from+n). */
  def shingleHash(words: Array[String], from: Int, n: Int): Long = {
    var h = -7046029254386353131L // FNV-ish seed
    var i = from
    val end = math.min(from + n, words.length)
    while (i < end) {
      val w = words(i)
      var j = 0
      var wh = 1125899906842597L
      while (j < w.length) { wh = wh * 31L + w.charAt(j); j += 1 }
      h = (h ^ wh) * -4417276706812531889L
      h = java.lang.Long.rotateLeft(h, 27) * 5L + 0x52dce729L
      i += 1
    }
    h
  }

  def tokenize(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** spark-trim (spaces only) + regex split with limit -1 — the exact
    * semantics of `split(trim(c), "\\s+")` (a leading tab survives
    * trim and yields a leading empty token; trailing empties kept). */
  def sparkTokens(s: String): Array[String] = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e).split("\\s+", -1)
  }
}

/** array<long> MinHash signature: min over shingles of
  * `a_i*h(shingle)+b_i` for k universal-hash mixes. */
case class MinHashSig(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val words = Hashing.tokenize(v.asInstanceOf[UTF8String].toString)
    val mins = Array.fill(k)(Long.MaxValue)
    val nShingles = math.max(1, words.length - shingleN + 1)
    var s = 0
    while (s < nShingles) {
      val h = Hashing.shingleHash(words, s, shingleN)
      var i = 0
      while (i < k) {
        val m = h * (2L * i + 1L) + i * -7046029254386353131L
        if (m < mins(i)) mins(i) = m
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** array<string> word n-gram shingles — value-identical to the HOF
  * form (graft.functions.Text.shingles: windows of n words joined by
  * one space; docs of ≤ n words collapse to one whole-doc shingle)
  * but built in one primitive loop instead of a boxed
  * sequence/slice/concat_ws lambda per window (~5× at corpus scale —
  * shingle explosion feeds the contamination and Jaccard ops).
  *
  * Tokenization reproduces `split(trim(c), "\\s+")` EXACTLY, not
  * Java's String.trim: Spark's trim strips only spaces (a leading tab
  * survives and split then emits a leading empty token) and Spark's
  * split keeps trailing empties (limit -1). Property-tested against
  * the HOF form on whitespace-adversarial inputs. */
case class ShingleArr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val words = Hashing.sparkTokens(v.asInstanceOf[UTF8String].toString)
    val out: Array[UTF8String] =
      if (words.length <= n) Array(UTF8String.fromString(words.mkString(" ")))
      else {
        val m = words.length - n + 1
        val arr = new Array[UTF8String](m)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i < m) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j))
            j += 1
          }
          arr(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        arr
      }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): ShingleArr = copy(child = c)
  override def prettyName: String = "shingle_arr"
}

/** 64-bit SimHash over whitespace tokens with SUBLINEAR term-frequency
  * feature weights: each distinct token votes ±(1 + log2(tf)) instead
  * of ±tf. Linear (per-occurrence) weighting is the scale hazard, not
  * an implementation detail: any frequency-dominant token (HTML tags,
  * markdown pipes, template boilerplate — or the scale fixture's
  * replica salt, ~50% of every salted doc's occurrences) contributes
  * ~|occurrences| of the vote mass and drags every such document's
  * signature toward that one token's hash — collapsing the banded
  * buckets into Σ|bucket|² pair explosions (round-11 10× bench: q12
  * ran 479 s, ~750× its linear share, on exactly this mechanism) AND
  * pulling unrelated repetition-dominated docs within hamming range
  * of each other. Pure set voting (binary weights, the Manku WWW'07
  * formulation) kills the collapse but also the frequency signal the
  * 16-bit-band blocking relies on to compress near-dup pairs into
  * small hamming distances (measured: jaccard≥0.7 recall 0.92 → 0.64
  * at the shipped band/hamming settings); log-damped tf keeps that
  * signal while bounding any single token to a log-factor of the vote
  * mass — the sublinear tf-weighting standard from text retrieval. */
case class SimHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val words = Hashing.tokenize(v.asInstanceOf[UTF8String].toString)
    // pass 1: tf per distinct token hash
    val tf = new java.util.HashMap[java.lang.Long, Int]()
    var t = 0
    while (t < words.length) {
      val h = java.lang.Long.valueOf(Hashing.shingleHash(words, t, 1))
      tf.merge(h, 1, Integer.sum _)
      t += 1
    }
    // pass 2: one vote of weight 1 + floor(log2(tf)) per distinct token
    val votes = new Array[Int](64)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = e.getKey.longValue()
      val w = 1 + (31 - Integer.numberOfLeadingZeros(e.getValue))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += w else votes(i) -= w
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    java.lang.Long.valueOf(sig)
  }
  override protected def withNewChildInternal(c: Expression): SimHashSig = copy(child = c)
  override def prettyName: String = "simhash_sig"
}

/** struct<n_shingles: bigint, dup_shingles: bigint> — within-document
  * duplicate n-word-shingle statistics (the Gopher repetition signal,
  * q81) computed ENTIRELY per row: the duplicate fraction only ever
  * compares a document's shingles with each other, so it never needed
  * the (doc, shingle) corpus shuffle the two-level-aggregation form
  * pays — this form runs at scan speed with zero shuffle at any
  * corpus size (measured: q81 3.4 s → scan floor at sf0.1).
  *
  * Value-identical to grouping the exploded [[ShingleArr]] shingles
  * per doc: same tokenization ([[Hashing.sparkTokens]]), same join
  * (tokens contain no spaces, so the space-join is injective and
  * string equality is window equality — no hash-collision risk), and
  * duplicates are counted over SORTED shingle strings (any total
  * order groups equal values adjacently). Docs of ≤ n words collapse
  * to one whole-doc shingle, matching `Text.shingles`. */
case class DupShingleStats(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n > 0, s"dup_shingle_stats needs n > 0, got $n")
  override def dataType: DataType = StructType(Seq(
    StructField("n_shingles", LongType, nullable = false),
    StructField("dup_shingles", LongType, nullable = false)))

  override def nullSafeEval(v: Any): Any = {
    val words = Hashing.sparkTokens(v.asInstanceOf[UTF8String].toString)
    if (words.length <= n) org.apache.spark.sql.catalyst.InternalRow(1L, 0L)
    else {
      val m = words.length - n + 1
      val sh = new Array[AnyRef](m)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        sh(i) = sb.toString
        i += 1
      }
      java.util.Arrays.sort(sh)
      var dup = 0L
      var s = 0
      while (s < m) {
        var e = s + 1
        while (e < m && sh(e) == sh(s)) e += 1
        if (e - s > 1) dup += (e - s)
        s = e
      }
      org.apache.spark.sql.catalyst.InternalRow(m.toLong, dup)
    }
  }
  override protected def withNewChildInternal(c: Expression): DupShingleStats = copy(child = c)
  override def prettyName: String = "dup_shingle_stats"
}

/** One-pass winnowing span fingerprints (Schleimer et al. SIGMOD'03 —
  * the [[graft.operators.Dedup.spanFingerprints]] kernel): whitespace
  * words → k-word grams → md5 per gram → minimum digest of every
  * w-position window → distinct, as ONE native expression. Replaces a
  * five-operator Column tree (`transform(md5)` + `sequence` + `slice`
  * + `array_min` + `array_distinct`) that allocated a gram string, a
  * 32-char hex string AND a w-element window array per text position —
  * q63's row-proportional cost leader at 100×. Semantics are
  * BIT-IDENTICAL to the tree it replaces (the q63 oracle replays them
  * in DuckDB): gram text is words joined by single spaces (texts of ≤k
  * words yield the whole text as one gram), the hash is lowercase md5
  * hex, and "min" is lexicographic on the hex digest — equivalent to
  * unsigned byte order on the raw digest, which is what the inner loop
  * compares (hex encoding is monotone per byte). Output keeps
  * first-occurrence order, matching `array_distinct`. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, s"winnow needs k > 0 and w > 0, got k=$k w=$w")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val HexChars = "0123456789abcdef".toCharArray

  override def nullSafeEval(v: Any): Any = {
    val words = Hashing.sparkTokens(v.asInstanceOf[UTF8String].toString)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder(64)
    // per-gram md5 digests (raw bytes — hex encoding is monotone per
    // byte, so unsigned byte comparison == hex lexicographic)
    val m = if (words.length <= k) 1 else words.length - k + 1
    val digests = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      val last = if (words.length <= k) words.length else i + k
      var j = i
      while (j < last) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      md.reset()
      digests(i) = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    def less(a: Array[Byte], b: Array[Byte]): Boolean = {
      var p = 0
      while (p < a.length) {
        val x = a(p) & 0xff
        val y = b(p) & 0xff
        if (x != y) return x < y
        p += 1
      }
      false
    }
    // window minima (w is small — a direct scan beats deque overhead),
    // distinct in first-occurrence order (array_distinct's contract)
    val seen = new java.util.LinkedHashSet[java.nio.ByteBuffer]()
    val windows = math.max(m - w, 0)
    i = 0
    while (i <= windows) {
      var best = digests(i)
      var j = i + 1
      val end = math.min(i + w, m)
      while (j < end) {
        if (less(digests(j), best)) best = digests(j)
        j += 1
      }
      seen.add(java.nio.ByteBuffer.wrap(best))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      val d = it.next().array()
      val hex = new Array[Char](32)
      var p = 0
      while (p < 16) {
        hex(2 * p) = HexChars((d(p) & 0xf0) >> 4)
        hex(2 * p + 1) = HexChars(d(p) & 0x0f)
        p += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
  override def prettyName: String = "winnow_fingerprints"
}

/** The coverage walk of [[graft.operators.Dedup.exciseSharedSpans]]
  * as ONE native expression: given a document's tokens and the start
  * positions of its hot (df ≥ minDf) k-grams, return the tokens NOT
  * covered by any hot gram. Replaces the HOF form
  * `filter(tokens, (w,i) => !exists(starts, st => i≥st && i<st+k))`,
  * which is O(tokens × hot-starts) PER ROW — linear on sparse
  * corpora but quadratic on a heavily-templated long document (hot
  * starts ≈ tokens: a 10⁵-token boilerplate mirror costs 10¹⁰
  * comparisons inside one task). Here: sort the starts, one merged
  * interval walk carrying `coverEnd = max(st + k over st ≤ i)` —
  * position i is covered iff i < coverEnd — O(tokens + starts·log
  * starts) with the start pointer advancing monotonically. Semantics
  * are BIT-IDENTICAL to the HOF (q111's DuckDB oracle replays them);
  * kept order is document order. */
case class ExciseKept(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {
  require(k >= 1, s"k-gram length must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any, s: Any): Any = {
    val toks = t.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val starts = s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = toks.numElements()
    val h = starts.numElements()
    val st = new Array[Int](h)
    var i = 0
    while (i < h) { st(i) = starts.getInt(i); i += 1 }
    java.util.Arrays.sort(st)
    val out = new Array[Any](n)
    var m = 0
    var j = 0
    var coverEnd = 0
    i = 0
    while (i < n) {
      while (j < h && st(j) <= i) {
        val e = st(j) + k
        if (e > coverEnd) coverEnd = e
        j += 1
      }
      if (i >= coverEnd) {
        out(m) = toks.getUTF8String(i)
        m += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (m == n) out
      else java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], m)
        .asInstanceOf[Array[Any]])
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ExciseKept = copy(left = l, right = r)
  override def prettyName: String = "excise_kept"
}

object TextSignatures {
  /** Column API for the native signatures. */
  def minHashSig(c: Column, k: Int, shingleN: Int = 3): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), k, shingleN))
  def simHashSig(c: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(c)))
  def shingles(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleArr(ColumnBridge.expression(c), n))
  def dupShingleStats(c: Column, n: Int): Column =
    ColumnBridge.column(DupShingleStats(ColumnBridge.expression(c), n))
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c), k, w))
  def exciseKept(toks: Column, starts: Column, k: Int): Column =
    ColumnBridge.column(ExciseKept(
      ColumnBridge.expression(toks), ColumnBridge.expression(starts), k))
}
