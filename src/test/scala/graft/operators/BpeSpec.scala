package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE fitting: the hand-checkable classic example pinned exactly,
  * determinism of the fit, fit/encode consistency, and the
  * compression property the QUALITY floor measures. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("fitFromCounts learns the textbook merges, deterministically") {
    // The Sennrich paper's shape: {low:5, lower:2, newest:6, widest:3}
    val counts = Seq(("low", 5L), ("lower", 2L),
      ("newest", 6L), ("widest", 3L))
    val merges = Bpe.fitFromCounts(counts, nMerges = 4)
    // pair counts round 1: (e,s) 9, (s,t</w>) 9, (w,e) 8(newest+widest)...
    // ties (e,s) vs (s,t</w>) break lexicographically: (e,s) first
    assert(merges.head == ("e", "s"), s"first merge ${merges.head}")
    assert(merges(1) == ("es", "t</w>"), s"second merge ${merges(1)}")
    // determinism: same input, same merges, every time
    assert(Bpe.fitFromCounts(counts, 4) == merges)
    assert(Bpe.fitFromCounts(counts.reverse, 4) == merges,
      "input order must not change the fit")
  }

  test("fit on a corpus + encode: the fit's segmentation reproduces, " +
       "tokens reassemble to the words, compression is real") {
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, "the newest widest lowest thing the newest est " + i))
      .toDF("id", "text")
    val merges = Bpe.fit(docs, "text", nMerges = 20, maxVocab = 1000)
    assert(merges.nonEmpty && merges.length <= 20)
    val enc = docs.select(col("id"), col("text"),
      Bpe.encode(col("text"), merges).as("toks"),
      size(split(lower(col("text")), "\\s+")).as("n_words"))
    val row = enc.filter(col("id") === 7L)
      .select("toks").as[Seq[String]].collect().head
    // lossless: stripping the sentinel and concatenation recovers the
    // lower-cased text's words
    val rebuilt = row.mkString("").replace(Bpe.Eow, " ").trim
    assert(rebuilt == "the newest widest lowest thing the newest est 7")
    // frequent words compress to one token ("the</w>" learned whole)
    assert(row.contains("the" + Bpe.Eow),
      s"'the' should be a single learned token, got $row")
    // corpus-level compression vs character splitting
    val stats = enc.agg(
      sum(size(col("toks"))).cast("double").as("toks"),
      sum(length(regexp_replace(lower(col("text")), "\\s+", "")))
        .cast("double").as("chars"))
      .as[(Double, Double)].collect().head
    assert(stats._1 / stats._2 <= 0.6,
      s"20 merges should compress well below 0.6 tokens/char on this " +
        s"corpus, got ${stats._1 / stats._2}")
    // null totality
    val n = Seq((1L, null: String)).toDF("id", "text")
      .select(Bpe.encode(col("text"), merges).as("t")).collect().head
    assert(n.isNullAt(0))
  }

  test("merge table publishes beside the corpus and loads back in " +
       "learned order (no silent refit drift)") {
    val docs = Seq.tabulate(100)(i => (i.toLong, "sent " + ("ab " * 5) + i))
      .toDF("id", "text")
    val merges = Bpe.fit(docs, "text", nMerges = 8)
    val t = java.nio.file.Files.createTempDirectory("graft_bpe_").toString
    Bpe.publishMerges(spark, t, merges)
    assert(Bpe.loadMerges(spark, t) == merges)
    // encode with the loaded table equals encode with the fit's own
    val a = docs.select(Bpe.encode(col("text"), merges).as("t"))
      .as[Seq[String]].collect().toSeq
    val b = docs.select(
        Bpe.encode(col("text"), Bpe.loadMerges(spark, t)).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(a == b)
  }

  test("maxVocab caps the collected head; nMerges bounds enforced") {
    val docs = Seq.tabulate(50)(i => (i.toLong, s"w$i w$i common common"))
      .toDF("id", "text")
    // cap far below the vocabulary: fit still learns from the head
    val merges = Bpe.fit(docs, "text", nMerges = 5, maxVocab = 3)
    assert(merges.nonEmpty)
    val e = intercept[IllegalArgumentException] {
      Bpe.fitFromCounts(Seq(("a", 1L)), nMerges = 0)
    }
    assert(e.getMessage.contains("nMerges"))
  }
}
