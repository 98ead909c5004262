package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expressions.MarkerCounts

/** Single-scan text statistics: every marker the quality family needs
  * (punctuation, stopwords, language markers, the space separator) is
  * counted by ONE `MarkerCounts` pass, and each metric is a cheap
  * arithmetic projection over the resulting array.
  *
  * Drop-in value-compatible with the per-marker forms in [[Text]] —
  * same counts, same tie-breaking, same score formulas — so the DuckDB
  * oracles keep their replace-arithmetic shape. Usage: materialize
  * `counts(text)` once (`withColumn`), derive everything from it.
  */
object TextStats {

  private val punct = Seq(".", ",", "!", "?", ";", ":")
  private val stop = Seq(" the ", " a ", " and ", " of ", " to ", " in ")

  /** All distinct markers, one array slot each (" the " etc. appear in
    * both the stopword and English marker sets — counted once). */
  val allMarkers: Seq[String] =
    (punct ++ stop ++ Text.langMarkers.flatMap(_._2) :+ " ").distinct

  private def idx(m: String): Int = {
    val i = allMarkers.indexOf(m)
    require(i >= 0, s"unknown marker: $m")
    i + 1 // element_at is 1-based
  }

  /** The one-pass counts array for a text column. */
  def counts(c: Column): Column = MarkerCounts(c, allMarkers)

  private def cnt(mc: Column, m: String): Column = element_at(mc, idx(m))
  private def sumOf(mc: Column, ms: Seq[String]): Column =
    ms.map(cnt(mc, _)).reduce(_ + _)

  def punctCount(mc: Column): Column = sumOf(mc, punct)
  def stopwordCount(mc: Column): Column = sumOf(mc, stop)
  def spaceCount(mc: Column): Column = cnt(mc, " ")

  /** Word count from the space count (single-space-separated words,
    * empty string → 0 — Text.wordCount semantics). */
  def wordCount(textCol: Column, mc: Column): Column =
    when(length(textCol) === 0, lit(0L)).otherwise(spaceCount(mc) + 1L)

  def langScore(mc: Column, lang: String): Column =
    sumOf(mc, Text.langMarkers.toMap.apply(lang))

  /** Argmax language pick — identical tie-breaking to [[Text.langId]]. */
  def langId(mc: Column): Column = {
    val scores = Text.langMarkers.map { case (l, _) => l -> langScore(mc, l) }
    val maxScore = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((l, s), e) =>
      when(s === maxScore && maxScore > 0, lit(l)).otherwise(e)
    }
  }

  /** Composite quality score — [[Text.qualityScore]] formula, fed from
    * the shared counts array. */
  def qualityScore(textCol: Column, mc: Column): Column = {
    val chars = length(textCol).cast("double")
    val words = wordCount(textCol, mc).cast("double")
    val lenScore = least(chars / lit(400.0), lit(1.0))
    val stopScore = least(
      stopwordCount(mc).cast("double") * lit(8.0) / greatest(words, lit(1.0)),
      lit(1.0))
    val punctPen = least(
      punctCount(mc).cast("double") * lit(4.0) / greatest(chars, lit(1.0)),
      lit(1.0))
    round(lit(0.5) * lenScore + lit(0.5) * stopScore - lit(0.25) * punctPen, 6)
  }
}
