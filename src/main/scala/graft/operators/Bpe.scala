package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.BpeEncode

/** BPE tokenizer FITTING (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — public
  * paper): learn a merge table from a corpus, then tokenize with it —
  * the missing half of the engine's text-pipeline story (counting
  * tokens of an EXISTING scheme is q48; training pipelines also FIT
  * the scheme on their own corpus).
  *
  * Scale shape — the standard practical decomposition:
  *  - the corpus-sized work is ONE distributed word count (a
  *    map-side-combinable groupBy over words; at 100 TB this is a
  *    shuffle of the VOCABULARY, not the corpus);
  *  - merge learning runs driver-side over the bounded word-frequency
  *    head (`maxVocab` rows, loud cap — the centroid/manifest collect
  *    stance): O(nMerges · vocab · word-length), seconds at any
  *    corpus size because the corpus only enters through the counts;
  *  - encoding is one distributed projection with the learned merges
  *    broadcast as expression state ([[graft.expressions.BpeEncode]]).
  *
  * Dropping the frequency tail (beyond `maxVocab`) is the standard
  * cap: hapaxes cannot move a merge decision that thousands of
  * occurrences of the head made. Every step is DETERMINISTIC —
  * best-pair ties break (count desc, pair asc) — so a fit is
  * reproducible run-over-run and spec-pinnable. */
object Bpe {

  /** The classic end-of-word sentinel: merges that close a word
    * (`e·</w>`) are distinct from word-internal ones (`e·s`). */
  val Eow = "</w>"

  /** Word → initial symbol sequence (chars, last carrying the
    * end-of-word sentinel). */
  def symbols(w: String): Array[String] = {
    // per CODE POINT, not per Java char: a supplementary-plane
    // character (CJK Ext B+, emoji) is a surrogate pair whose halves
    // are not valid text on their own — a char split would emit
    // broken symbols that can never merge back across the boundary
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val c = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + c)
      i += c
    }
    if (out.nonEmpty) out(out.length - 1) = out(out.length - 1) + Eow
    out.toArray
  }

  /** Learn `nMerges` merges from a word-frequency table (driver-side,
    * bounded input — the distributed entry is [[fit]]). Returns the
    * merges in learned priority order; may be shorter than `nMerges`
    * if the vocabulary exhausts (every word a single symbol). */
  def fitFromCounts(wordCounts: Seq[(String, Long)],
                    nMerges: Int): Seq[(String, String)] = {
    require(nMerges > 0 && nMerges <= 4096,
      s"nMerges in (0, 4096], got $nMerges")
    var words: Array[(Array[String], Long)] =
      wordCounts.iterator.filter(_._1.nonEmpty)
        .map { case (w, c) => (symbols(w), c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < nMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // deterministic: highest count, ties by lexicographically
        // smallest pair — reproducible fits, spec-pinnable merges
        val best = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
      }
    }
    merges.toSeq
  }

  /** One merge applied to one symbol sequence (left-to-right,
    * non-overlapping — the classic scan). */
  def mergePair(syms: Array[String], p: (String, String)): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (p._1 + p._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** FIT on a corpus: one distributed word count (lower-cased,
    * whitespace words under the CJK char-level fallback —
    * [[graft.functions.Text.cjkPreSplit]]: ideographic scripts write
    * without spaces, so each CJK char fits as its own word instead of
    * whole clauses degenerating the merge table; identity on
    * space-delimited text), the frequency head collected under
    * `maxVocab` (deterministic order: count desc, word asc), merges
    * learned driver-side. The segmentation here and in
    * [[graft.expressions.BpeEncode]] are THE SAME function — Java
    * regex `\s+` over the pre-split text vs the kernel's exact-`\s`
    * char test + standalone-CJK words — so encoding a word the fit
    * saw yields exactly the fit's segmentation on any script. */
  def fit(corpus: DataFrame, textCol: String, nMerges: Int,
          maxVocab: Int = 65536): Seq[(String, String)] = {
    require(maxVocab > 0 && maxVocab <= 1000000,
      s"maxVocab in (0, 1e6], got $maxVocab")
    val wc = corpus
      .select(explode(split(
        graft.functions.Text.cjkPreSplit(lower(col(textCol))),
        "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    fitFromCounts(wc, nMerges)
  }

  /** Tokenize a text column with a learned merge table — one
    * distributed projection, merges carried as expression state
    * (bounded: ≤ nMerges pairs). Returns `array<string>` of subword
    * tokens (end-of-word sentinel on word-final tokens). */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(BpeEncode(
      ColumnBridge.catalystExpression(lower(text)), merges))
  }

  /** Persist a learned merge table beside the corpus it was fit on
    * (`$path/bpe_merges` — the centroid/qbin_cuts sidecar
    * convention): the tokenizer is a CORPUS artifact, and every later
    * run (or retained-generation consumer) must encode with exactly
    * the table the fit produced, not a refit that a changed corpus
    * would silently drift. */
  def publishMerges(spark: org.apache.spark.sql.SparkSession,
                    path: String, merges: Seq[(String, String)]): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("rank", "lhs", "rhs")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/bpe_merges")
  }

  /** Load a published merge table in learned priority order; fails
    * loudly on a missing sidecar (never a silent refit). */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[(String, String)] =
    spark.read.parquet(s"$path/bpe_merges").orderBy("rank")
      .select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
}
