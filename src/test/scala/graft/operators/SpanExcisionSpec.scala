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

  test("docs shorter than k, empty and null text pass through untouched; " +
    "empty/null report n_tokens = 0, not the [\"\"] split artifact") {
    val rows = Seq((1L, "one two"), (2L, ""), (3L, null), (4L, "  \t "))
      .toDF("id", "text")
    val out = Dedup.exciseSharedSpans(rows, "text", "id", k = 4, minDf = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("one two", 2L, 0L)))
    assert(out(2L) == (("", 0L, 0L)))
    assert(out(3L) == (("", 0L, 0L)))
    assert(out(4L) == (("", 0L, 0L)), "whitespace-only is zero tokens")
  }

  test("adversarial all-hot document: a fully-templated long doc is " +
    "linear, not quadratic (the ExciseKept kernel's reason to exist)") {
    // Two 40k-token mirrors of the same text: EVERY gram is hot, so
    // hot-starts ~= tokens. The replaced HOF form cost
    // O(tokens x hot-starts) ~= 1.6e9 comparisons per doc; the
    // sorted-starts interval walk is one linear pass. A unique doc
    // rides along to pin that unique material still survives.
    val n = 40000
    val template = (0 until n).map(i => s"t${i % 997}").mkString(" ")
    val out = run(Seq(
      (1L, template),
      (2L, template),
      (3L, "unique island " + template.take(30))), k = 8, minDf = 2L)
    assert(out(1L)._2 == n.toLong && out(1L)._3 == n.toLong,
      s"mirror 1 fully excised: ${out(1L)._2}/${out(1L)._3}")
    assert(out(2L)._3 == n.toLong, "mirror 2 fully excised")
    assert(out(3L)._1.startsWith("unique island"),
      "unique material survives beside the template")
  }

  test("kernel bit-parity: ExciseKept equals a brute-force Scala " +
    "replay of the covered(i) <=> exists st in (i-k, i] rule") {
    // deterministic mixed corpus: shared blocks at varied offsets,
    // gaps below/above k, duplicate-start-free by construction
    val shared = "s1 s2 s3 s4 s5"
    val rows = (0L until 40L).map { id =>
      val uniq = (0 until (id % 7).toInt).map(j => s"u${id}_$j")
      val parts =
        if (id % 3 == 0) uniq ++ Seq(shared) ++ uniq.map(_ + "x")
        else if (id % 3 == 1) Seq(shared) ++ uniq
        else uniq :+ s"tail$id"
      (id, parts.mkString(" "))
    }
    val k = 3
    val out = run(rows, k = k, minDf = 2L)
    // brute-force replay
    val toks = rows.map { case (id, t) =>
      id -> (if (t.trim.isEmpty) Array[String]()
             else t.trim.split("\\s+"))
    }.toMap
    val df = scala.collection.mutable.Map[String, Set[Long]]()
    toks.foreach { case (id, ws) =>
      ws.sliding(k).filter(_.length == k)
        .foreach(g => df.updateWith(g.mkString(" "))(
          o => Some(o.getOrElse(Set()) + id)))
    }
    val hot = df.collect { case (g, ids) if ids.size >= 2 => g }.toSet
    rows.foreach { case (id, _) =>
      val ws = toks(id)
      val starts = ws.sliding(k).zipWithIndex
        .collect { case (g, i) if g.length == k &&
          hot(g.mkString(" ")) => i }.toSet
      val kept = ws.zipWithIndex.collect {
        case (w, i) if !starts.exists(st => i >= st && i < st + k) => w }
      assert(out(id)._1 == kept.mkString(" "), s"doc $id clean_text")
      assert(out(id)._3 == (ws.length - kept.length).toLong,
        s"doc $id n_removed")
    }
  }

  test("minDf < 2 is refused (it would excise every position)") {
    intercept[IllegalArgumentException] {
      Dedup.exciseSharedSpans(Seq((1L, "a b")).toDF("id", "text"),
        "text", "id", k = 1, minDf = 1L)
    }
  }
}
