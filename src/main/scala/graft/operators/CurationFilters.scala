package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Text, TextStats}

/** Document-level curation filters for the training-data pipeline
  * extensions (builder brief): Gopher-style composite rule filtering,
  * unigram-LM familiarity/OOV scoring, and PII scrubbing stats.
  *
  * Reference analog: the reference's cleanse stage drops malformed rows
  * before they reach the DWD layer
  * (/root/reference/src/main/scala/com/mashibing/study/lakehouse/dwd/ProcessODSDataToDWD.scala);
  * these ops are the corpus-quality equivalents a pretraining pipeline
  * applies at the same point — each a pure map-side projection/filter or
  * a map-side-combinable aggregation, so they scale linearly over a
  * 100 TB corpus.
  */
object CurationFilters {

  /** Gopher-style document rules (Rae et al. 2021, §A1.1 — public
    * paper), in integer-exact form: every bound is an integer
    * cross-multiplication, never a float ratio, so the filter is
    * bit-reproducible across engines and the oracle can replay it in
    * ANSI SQL.
    *
    * - `minWords ≤ n_words ≤ maxWords`
    * - mean word length in `[minMeanWlen, maxMeanWlen]`, tested as
    *   `minMeanWlen·n_words ≤ swlen ≤ maxMeanWlen·n_words` where
    *   `swlen` is the space-stripped char count
    * - at least `minStopwords` stop-word hits (Gopher's "contains ≥2
    *   of a small stop-word set" rule)
    * - punctuation-soup bound: `punct_cnt · 10 ≤ n_words`
    */
  final case class GopherRules(
      minWords: Long = 30,
      maxWords: Long = 10000,
      minMeanWlen: Long = 3,
      maxMeanWlen: Long = 10,
      minStopwords: Long = 2)

  /** Keep documents passing every [[GopherRules]] bound; emit the
    * integer evidence columns alongside. ONE `TextStats.counts` scan
    * per doc feeds the word/space/stopword/punctuation counters (the
    * single-scan MarkerCounts story q17/q18 established) — no shuffle,
    * no UDF: a codegen'd projection + filter that predicate-pushes
    * nothing but reads only `idCol`/`textCol`. */
  def gopherFilter(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id",
                   rules: GopherRules = GopherRules(),
                   cjkAware: Boolean = false): DataFrame = {
    // cjkAware: word stats over char-level CJK words (one word per
    // ideograph, Text.cjkPreSplit — identity on space-delimited
    // scripts). Whole-clause "words" otherwise blow the mean-word-
    // length bound and zero the word count on unsegmented scripts;
    // tune `rules` for the char-level regime (e.g. minMeanWlen = 1).
    val t =
      if (cjkAware) Text.cjkPreSplit(col(textCol)) else col(textCol)
    val mc = TextStats.counts(t)
    docs
      .withColumn("_mc", mc)
      .select(
        col(idCol),
        TextStats.wordCount(t, col("_mc")).as("n_words"),
        (length(t) - TextStats.spaceCount(col("_mc")))
          .cast("long").as("swlen"),
        TextStats.stopwordCount(col("_mc")).as("stop_cnt"),
        TextStats.punctCount(col("_mc")).as("punct_cnt"))
      .filter(
        col("n_words") >= rules.minWords && col("n_words") <= rules.maxWords &&
        col("swlen") >= lit(rules.minMeanWlen) * col("n_words") &&
        col("swlen") <= lit(rules.maxMeanWlen) * col("n_words") &&
        col("stop_cnt") >= rules.minStopwords &&
        col("punct_cnt") * 10 <= col("n_words"))
  }

  /** Unigram-LM corpus scoring (the CCNet/perplexity-filter shape,
    * Wenzek et al. 2020, in integer-exact form): train a unigram model
    * over the corpus (token → count), then score each document by
    * token coverage against it — `n_tokens`, `oov_cnt` (tokens whose
    * corpus count is below `minCount`), `lm_mass` (summed corpus
    * counts of the doc's tokens — the integer analog of summed log
    * probability, order-independent and exact where a float log-prob
    * sum is not), and the rounded OOV ratio.
    *
    * Scale shape: explode → map-side-combinable token count (the model
    * is one tiny reduce at any corpus size once Zipf-pruned), join the
    * model back to the exploded tokens, re-aggregate per doc. The
    * model side is an aggregate, so AQE broadcasts it when it fits and
    * shuffle-joins otherwise — no static hint forces a 100 TB vocab
    * through the driver. */
  def unigramLmScore(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id",
                     minCount: Long = 200,
                     cjkAware: Boolean = false): DataFrame = {
    // cjkAware: one token per ideograph (Text.cjkPreSplit — identity
    // on space-delimited scripts), so the model counts CJK chars
    // instead of unsegmentable whole clauses
    val tokenize: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (cjkAware) Text.tokensCjk else Text.tokens
    val tok = docs.select(col(idCol),
      explode(tokenize(col(textCol))).as("w"))
    val model = tok.groupBy("w").agg(count(lit(1)).as("c"))
    val oov = sum(when(col("c") < minCount, 1L).otherwise(0L))
    tok.join(model, "w")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        oov.as("oov_cnt"),
        sum(col("c")).as("lm_mass"),
        round(oov.cast("double") / count(lit(1)).cast("double"), 6)
          .as("oov_ratio"))
  }

  /** Gopher's duplicate n-gram repetition signal (Rae et al. 2021,
    * §A1.1 "fraction of characters in duplicate n-grams", word-count
    * form): per document, the fraction of n-word shingle INSTANCES
    * whose within-doc count exceeds one. Complements q25's top-word
    * ratio — a doc can have a flat unigram profile and still be 90%
    * repeated phrases; this is the signal that catches boilerplate
    * loops and decoding repetition.
    *
    * Shape: the statistic only compares a document's shingles with
    * EACH OTHER, so it is computed per row by the native
    * [[graft.expressions.DupShingleStats]] — one codegen'd projection,
    * zero shuffle, scan-speed at any corpus size (the original
    * two-level (doc, shingle) aggregation paid a corpus-sized shuffle
    * for a per-row answer: 3.4 s → scan floor at sf0.1, and
    * CurationFiltersSpec pins the two forms value-identical). Integer
    * counts plus one rounded ratio, bit-reproducible in the oracle. */
  def dupNgramFraction(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id", n: Int = 3): DataFrame =
    docs
      // null text counts as one empty whole-doc shingle — exactly what
      // the explode+aggregate form produced (Text.shingles(null) is
      // array(concat_ws(..., null)) = [""]), so the per-row expression
      // keeps the same row set instead of emitting a row of nulls
      .select(col(idCol),
        graft.expressions.TextSignatures
          .dupShingleStats(coalesce(col(textCol), lit("")), n).as("_st"))
      .select(
        col(idCol),
        col("_st.n_shingles").as("n_shingles"),
        col("_st.dup_shingles").as("dup_shingles"),
        round(col("_st.dup_shingles").cast("double") /
          col("_st.n_shingles").cast("double"), 6).as("dup_frac"))

  /** PII scrub + audit stats: replace emails / IPv4s / phone-ish digit
    * runs with typed placeholders ([[Text.scrubPii]] — patterns valid
    * in both Java regex and RE2, so the oracle replays them verbatim),
    * and count each placeholder in the scrubbed output via
    * replace-arithmetic. Pure map-side regexp work, codegen'd, no
    * shuffle — the per-row cost IS the regex engine, which is exactly
    * what a 100 TB scrub pass costs anywhere. */
  def piiScrubStats(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), Text.scrubPii(col(textCol)).as("scrubbed"))
      .select(
        col(idCol),
        col("scrubbed"),
        Text.markerCount(col("scrubbed"), "<EMAIL>").as("email_cnt"),
        Text.markerCount(col("scrubbed"), "<PHONE>").as("phone_cnt"),
        Text.markerCount(col("scrubbed"), "<IP>").as("ip_cnt"))
}
