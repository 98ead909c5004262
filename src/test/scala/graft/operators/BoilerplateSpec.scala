package graft.operators

import graft.SparkTestBase

/** Corpus-frequency boilerplate removal (q82): segment-level CCNet-style
  * line dedup — scrub segments occurring in ≥ minDocs documents,
  * reassemble survivors in order. */
class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  // 8-word banner shared by many docs; unique bodies of 8 words each
  private val banner = "one two three four five six seven eight"
  private def body(i: Int) =
    s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h"

  test("scrub removes the shared banner, keeps unique content in order") {
    val docs = ((0 until 25).map(i => (i.toLong, s"$banner ${body(i)}")) :+
      (99L, s"${body(99)} tail words here")).toDF("doc_id", "text")
    val out = Boilerplate.scrubFrequentSegments(docs, minDocs = 20)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 26) // row parity: every doc keeps its row
    out.filter(_._1 < 25).foreach { case (id, clean, nSeg, nKept) =>
      assert(clean == body(id.toInt), s"doc $id: $clean")
      assert(nSeg == 2 && nKept == 1, s"doc $id: nSeg=$nSeg nKept=$nKept")
    }
    // the un-bannered doc is untouched (its segments are unique)
    val (_, clean99, nSeg99, nKept99) = out.find(_._1 == 99L).get
    assert(clean99 == s"${body(99)} tail words here")
    assert(nSeg99 == 2 && nKept99 == 2)
  }

  test("a fully-boilerplate document keeps its row with empty text") {
    val docs = (0 until 25).map(i => (i.toLong, banner)).toDF("doc_id", "text")
    val out = Boilerplate.scrubFrequentSegments(docs, minDocs = 20)
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == 25)
    out.foreach { case (_, clean, nSeg, nKept) =>
      assert(clean == "" && nSeg == 1 && nKept == 0)
    }
  }

  test("a segment below the document-frequency threshold survives") {
    val shared19 = (0 until 19).map(i => (i.toLong, s"$banner ${body(i)}"))
    val docs = shared19.toDF("doc_id", "text")
    val out = Boilerplate.scrubFrequentSegments(docs, minDocs = 20)
      .as[(Long, String, Long, Long)].collect()
    out.foreach { case (id, clean, _, nKept) =>
      assert(clean == s"$banner ${body(id.toInt)}", s"doc $id scrubbed early")
      assert(nKept == 2)
    }
  }

  test("null-text documents keep their row (segmented as empty text)") {
    val docs = ((0 until 25).map(i => (i.toLong, s"$banner ${body(i)}")) :+
      (99L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Boilerplate.scrubFrequentSegments(docs, minDocs = 20)
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == 26, "row parity must include null-text docs")
    val (_, clean, nSeg, nKept) = out.find(_._1 == 99L).get
    assert(clean == "" && nSeg == 1 && nKept == 1) // its "" segment is unique here
  }

  test("repeated segment WITHIN one doc does not count as cross-doc boilerplate") {
    // the banner appears 3x in one doc but only in 1 distinct doc
    val docs = Seq((1L, s"$banner $banner $banner")).toDF("doc_id", "text")
    val out = Boilerplate.scrubFrequentSegments(docs, minDocs = 2)
      .as[(Long, String, Long, Long)].collect()
    assert(out.head._2 == s"$banner $banner $banner")
  }

  test("partial last segments are distinct units: alignment decides identity") {
    // same words, different alignment — "nine ten" tail is its own segment
    val docs = ((0 until 25).map(i => (i.toLong, s"$banner nine ten")) :+
      (99L, s"start pad $banner nine ten")).toDF("doc_id", "text")
    val out = Boilerplate.scrubFrequentSegments(docs, minDocs = 20)
      .as[(Long, String, Long, Long)].collect()
    // docs 0..24: banner segment scrubbed, "nine ten" segment shared by
    // 25 docs → also scrubbed
    out.filter(_._1 < 25).foreach { case (_, clean, nSeg, nKept) =>
      assert(clean == "" && nSeg == 2 && nKept == 0)
    }
    // doc 99's words are offset by 2 — every one of its segments is
    // cut differently, so nothing matches the frequent set
    assert(out.find(_._1 == 99L).get._2 == s"start pad $banner nine ten")
  }

  test("fingerprint keys reproduce the exact string-keyed output on the fixture corpus") {
    // the q82 shuffle-bytes fix: 128-bit keys must be a pure internal
    // substitution — byte-identical scrub output vs exactStringKeys
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fp = Boilerplate.scrubFrequentSegments(docs, minDocs = 5)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val exact = Boilerplate
      .scrubFrequentSegments(docs, minDocs = 5, exactStringKeys = true)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(fp == exact)
    assert(fp.nonEmpty)
  }

  test("collision audit: fixture corpus has one distinct segment per 128-bit key") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val segs = docs.select(posexplode(
        graft.functions.Text.segments(coalesce(col("text"), lit("")), 8))
      .as(Seq("pos", "seg")))
    val worst = segs.select(col("seg"),
        xxhash64(col("seg")).as("f1"), xxhash64(col("seg"), lit(1)).as("f2"))
      .groupBy("f1", "f2").agg(countDistinct(col("seg")).as("n"))
      .agg(max(col("n"))).as[Long].head()
    assert(worst == 1L, s"128-bit fingerprint collision on fixture: $worst")
  }
}
