package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Gopher rules / unigram-LM scoring / PII scrub — the document-level
  * curation filters added round 11 (q78/q79/q80). */
class CurationFiltersSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf).documents

  test("gopherFilter: every survivor satisfies every rule; rules actually cut") {
    val rules = CurationFilters.GopherRules()
    val out = CurationFilters.gopherFilter(docs, rules = rules)
    val rows = out.select("doc_id", "n_words", "swlen", "stop_cnt", "punct_cnt")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nw, sw, st, pc) =>
      assert(nw >= rules.minWords && nw <= rules.maxWords, s"doc $id words $nw")
      assert(sw >= rules.minMeanWlen * nw && sw <= rules.maxMeanWlen * nw,
        s"doc $id mean-wlen bound: swlen=$sw n_words=$nw")
      assert(st >= rules.minStopwords, s"doc $id stopwords $st")
      assert(pc * 10 <= nw, s"doc $id punct $pc vs words $nw")
    }
    // the filter is not vacuous on the fixture corpus
    assert(out.count() < docs.count())
    // tightening a bound monotonically shrinks the survivor set
    val tighter = CurationFilters.gopherFilter(docs,
      rules = rules.copy(minStopwords = rules.minStopwords + 2))
    assert(tighter.count() <= out.count())
    val survivors = rows.map(_._1).toSet
    val tightSurvivors = tighter.select("doc_id").as[Long].collect().toSet
    assert(tightSurvivors.subsetOf(survivors))
  }

  test("gopherFilter: hand-built edge docs land on the right side of each rule") {
    val edge = Seq(
      // too short (< 30 words)
      (1L, "the a of to in and " * 3),
      // passes everything: 40 mid-length words incl stopwords
      (2L, (Seq.fill(19)("table the") :+ "scan a").mkString(" ")),
      // mean word length too high (no spaces worth of short words)
      (3L, Seq.fill(40)("extraordinarily").mkString(" ")),
      // punctuation soup
      (4L, (Seq.fill(40)("the data . . . ")).mkString(" "))
    ).toDF("doc_id", "text")
    val kept = CurationFilters.gopherFilter(edge)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"kept $kept")
  }

  test("unigramLmScore: model counts and per-doc mass reconcile exactly") {
    val out = CurationFilters.unigramLmScore(docs, minCount = 200)
    val rows = out.select("doc_id", "n_tokens", "oov_cnt", "lm_mass", "oov_ratio")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.length == docs.count())
    // token totals reconcile: sum of per-doc n_tokens == corpus tokens
    val corpusTokens = docs.select(explode(graft.functions.Text.tokens($"text")))
      .count()
    assert(rows.map(_._2).sum == corpusTokens)
    // lm_mass is bounded: a doc's mass is at most n_tokens * max token count
    val maxCnt = docs.select(explode(graft.functions.Text.tokens($"text")).as("w"))
      .groupBy("w").count().agg(max("count")).as[Long].head()
    rows.foreach { case (id, nt, oov, mass, ratio) =>
      assert(oov <= nt, s"doc $id")
      assert(mass >= nt && mass <= nt * maxCnt, s"doc $id mass $mass")
      assert(math.abs(ratio - oov.toDouble / nt) < 1e-6 + 1e-9, s"doc $id ratio")
    }
    // the planted rare token is OOV: docs containing it have oov_cnt > 0
    val rare = docs.select(explode(graft.functions.Text.tokens($"text")).as("w"))
      .groupBy("w").count().filter($"count" < 200)
      .select("w").as[String].collect().toSet
    if (rare.nonEmpty) {
      val rareDocs = docs.filter(
        rare.map(w => $"text".contains(s" $w ") || $"text".startsWith(s"$w ") ||
          $"text".endsWith(s" $w") || $"text" === w).reduce(_ || _))
        .select("doc_id").as[Long].collect().toSet
      val flagged = rows.filter(_._3 > 0).map(_._1).toSet
      assert(flagged == rareDocs, s"flagged $flagged vs rare-token docs $rareDocs")
    }
  }

  test("dupNgramFraction: hand-built repetition lands exactly; corpus totals reconcile") {
    val edge = Seq(
      // "a b c a b c a b" -> 6 shingles: abc bca cab abc bca cab -> all 6 dup
      (1L, "a b c a b c a b"),
      // all distinct words -> 0 duplicate shingles
      (2L, "one two three four five six"),
      // short doc (<= 3 words) -> whole doc is the single shingle, not dup
      (3L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = CurationFilters.dupNgramFraction(edge)
      .select("doc_id", "n_shingles", "dup_shingles", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 6L, 6L, 1.0)))
    assert(out(1) == ((2L, 4L, 0L, 0.0)))
    assert(out(2) == ((3L, 1L, 0L, 0.0)))
    // corpus: every doc appears once; per-doc shingle count = max(1, words-2)
    val rows = CurationFilters.dupNgramFraction(docs)
      .select("doc_id", "n_shingles", "dup_shingles")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == docs.count())
    val wordCounts = docs
      .select($"doc_id", size(graft.functions.Text.tokens($"text")).as("nw"))
      .as[(Long, Int)].collect().toMap
    rows.foreach { case (id, ns, dup) =>
      assert(ns == math.max(1, wordCounts(id) - 2), s"doc $id")
      assert(dup >= 0 && dup <= ns)
      assert(dup != 1, s"doc $id: a duplicated shingle contributes >= 2 instances")
    }
  }

  test("dupNgramFraction: native per-row form equals the two-level aggregation form") {
    // the shuffle-free DupShingleStats path must be value-identical to
    // grouping the exploded shingles — on the fixture corpus AND on
    // whitespace-adversarial rows
    val adversarial = Seq(
      (9001L, "\ta  b   a  b a b"), // leading tab, run-length spaces
      (9002L, " x x x "), (9003L, ""), (9004L, "lone"),
      (9005L, null.asInstanceOf[String]) // both forms: one empty shingle
    ).toDF("doc_id", "text")
    Seq(docs, adversarial).foreach { d =>
      val native = CurationFilters.dupNgramFraction(d)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
      val sh = d.select($"doc_id",
        explode(graft.functions.Text.shingles($"text", 3)).as("s"))
      val dup = sum(when($"c" > 1, $"c").otherwise(0L))
      val agg = sh.groupBy($"doc_id", $"s").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(sum($"c").as("n_shingles"), dup.as("dup_shingles"),
          round(dup.cast("double") / sum($"c").cast("double"), 6).as("dup_frac"))
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(native == agg)
    }
  }

  test("piiScrubStats: placeholders replace the planted spans, text otherwise intact") {
    val planted = Seq(
      (1L, "reach me at jane.doe+spam@mail-host.org today"),
      (2L, "server at 10.0.255.3 and backup 192.168.1.250"),
      (3L, "call +1 (555) 010-9921 or 555 010 1234 now"),
      (4L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val out = CurationFilters.piiScrubStats(planted)
      .select("doc_id", "scrubbed", "email_cnt", "phone_cnt", "ip_cnt")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0)._2 == "reach me at <EMAIL> today")
    assert((out(0)._3, out(0)._4, out(0)._5) == ((1L, 0L, 0L)))
    assert(out(1)._2 == "server at <IP> and backup <IP>")
    assert((out(1)._3, out(1)._4, out(1)._5) == ((0L, 0L, 2L)))
    assert(out(2)._2 == "call <PHONE> or <PHONE> now")
    assert((out(2)._3, out(2)._4, out(2)._5) == ((0L, 2L, 0L)))
    assert(out(3)._2 == "nothing sensitive here at all")
    assert((out(3)._3, out(3)._4, out(3)._5) == ((0L, 0L, 0L)))
  }

  test("q78/q79/q80 catalog queries run and return rows at sf0.001") {
    assert(graft.Queries.q78(spark, sf).count() > 0)
    assert(graft.Queries.q79(spark, sf).count() > 0)
    val pii = graft.Queries.q80(spark, sf)
    assert(pii.filter($"email_cnt" > 0).count() > 0)
    assert(pii.filter($"phone_cnt" > 0).count() > 0)
    assert(pii.filter($"ip_cnt" > 0).count() > 0)
  }
}
