package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Dedup.exciseSharedSpans]] — verbatim-span removal semantics on
  * hand-computable corpora: exact covered-region arithmetic, overlap
  * merging, boundary conservatism, short/empty-doc passthrough, and
  * the df threshold (distinct DOCS, not occurrences). */
class SpanExcisionSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int, minDf: Long) =
    Dedup.exciseSharedSpans(rows.toDF("id", "text"), "text", "id",
        k = k, minDf = minDf)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("a template shared by >= minDf docs is excised everywhere; " +
    "unique prefixes/suffixes survive; boundary grams trim nothing") {
    // 4-gram template "a b c d" in 3 docs, distinct elsewhere
    val out = run(Seq(
      (1L, "u1 u2 a b c d v1 v2"),
      (2L, "w1 a b c d"),
      (3L, "a b c d x1 x2 x3"),
      (4L, "y1 y2 y3 y4 y5")), k = 4, minDf = 3L)
    assert(out(1L) == (("u1 u2 v1 v2", 8L, 4L)))
    assert(out(2L) == (("w1", 5L, 4L)))
    assert(out(3L) == (("x1 x2 x3", 7L, 4L)))
    assert(out(4L) == (("y1 y2 y3 y4 y5", 5L, 0L)))
  }

  test("overlapping hot grams merge their covered regions (a LONG " +
    "shared span excises as one block, interior grams all hot)") {
    // shared 6-word span with k=4: starts 0..2 inside the span all
    // reach df=2 -> the whole 6 words go, in both docs
    val out = run(Seq(
      (1L, "p q s1 s2 s3 s4 s5 s6"),
      (2L, "s1 s2 s3 s4 s5 s6 r")), k = 4, minDf = 2L)
    assert(out(1L) == (("p q", 8L, 6L)))
    assert(out(2L) == (("r", 7L, 6L)))
  }

  test("df counts DISTINCT documents: a gram repeated inside ONE doc " +
    "does not trip the threshold") {
    val out = run(Seq(
      (1L, "a b c a b c a b c"),
      (2L, "z1 z2 z3")), k = 3, minDf = 2L)
    assert(out(1L)._3 == 0L, "intra-doc repetition alone must not excise")
  }

  test("docs shorter than k, empty and null text pass through untouched") {
    val rows = Seq((1L, "one two"), (2L, ""), (3L, null))
      .toDF("id", "text")
    val out = Dedup.exciseSharedSpans(rows, "text", "id", k = 4, minDf = 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "one two")
    assert(out(2L) == "")
    assert(out(3L) == "")
  }

  test("minDf < 2 is refused (it would excise every position)") {
    intercept[IllegalArgumentException] {
      Dedup.exciseSharedSpans(Seq((1L, "a b")).toDF("id", "text"),
        "text", "id", k = 1, minDf = 1L)
    }
  }
}
