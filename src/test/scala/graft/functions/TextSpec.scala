package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextSpec extends SparkTestBase {
  import spark.implicits._

  test("wordCount/markerCount arithmetic") {
    val df = Seq("a b c", "", "the cat and the dog").toDF("t")
      .select(Text.wordCount($"t").as("w"))
    assert(df.as[Long].collect().toSeq == Seq(3L, 0L, 5L))
    val m = Seq(" x the y the z ").toDF("t")
      .select(Text.markerCount($"t", " the ").as("c")).as[Long].head()
    assert(m == 2L)
  }

  test("shingles: n-word windows; short docs collapse to one shingle") {
    val sh = Seq("a b c d").toDF("t")
      .select(Text.shingles($"t", 3).as("s")).as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(Text.shingles($"t", 3).as("s")).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("langId picks marker-majority language, und when none") {
    val df = Seq(
      "walk the dog and the cat of mine",
      "ich mag der hund und die katze und der vogel",
      "xyzzy plugh").toDF("t")
      .select(Text.langId($"t").as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "und"))
  }

  test("fingerprint normalizes case/punct/whitespace") {
    val df = Seq("Hello, World!  foo", "hello world foo").toDF("t")
      .select(Text.fingerprint($"t").as("f"))
    val fps = df.as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("minhash signature: identical docs identical, k entries") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps",
      "totally different words here now").toDF("t")
      .select(Text.minHashSignature($"t", 16).as("s"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0).size == 16 && sigs(0) == sigs(1) && sigs(0) != sigs(2))
  }

  test("simhash: identical -> hamming 0; near-dup closer than unrelated") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely unrelated text about spark catalyst optimizer internals stuff"
    val df = Seq(base, base, near, far).toDF("t").select(Text.simHash($"t").as("h"))
    val Array(a, b, c, d) = df.as[Long].collect()
    assert(a == b)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, c) < ham(a, d))
  }

  test("rollingHash is order-sensitive") {
    val df = Seq("a b c", "c b a").toDF("t").select(Text.rollingHash($"t").as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) != hs(1))
  }

  test("stripHtml removes tags, scrubPii masks emails/phones/ips") {
    val html = Seq("<p>Hello <b>world</b></p> done").toDF("t")
      .select(Text.stripHtml($"t").as("s")).as[String].head()
    assert(html.trim == "Hello world done")
    val pii = Seq("mail a.b+c@example.org or call +1 (415) 555-0199 from 10.0.0.1 ok")
      .toDF("t").select(Text.scrubPii($"t").as("s")).as[String].head()
    assert(pii == "mail <EMAIL> or call <PHONE> from <IP> ok")
  }

  test("supplementary-plane CJK (Ext B+, surrogate pairs): isCjk sees " +
    "the code point, cjkPreSplit keeps pairs atomic, Bpe.symbols " +
    "never emits surrogate halves") {
    // U+2000B (Ext B) and U+2A700 (Ext C) — both plane 2
    assert(Text.isCjk(0x2000B) && Text.isCjk(0x2A700) &&
      Text.isCjk(0x323AF))
    assert(!Text.isCjk(0x1F600), "emoji (plane 1) is not CJK")
    assert(!Text.isCjk('\uD840'), "a lone surrogate half is not CJK")
    assert(Text.isCjk('中') && !Text.isCjk('a'), "BMP behavior kept")
    // pre-split: supplementary ideographs glued to Latin/digits come
    // out as standalone words, pairs intact
    val toks = Seq("ab𠀋x𪜀9 tail").toDF("t")
      .select(Text.tokensCjk($"t").as("w")).as[Seq[String]].head()
    assert(toks == Seq("ab", "𠀋", "x", "𪜀", "9",
      "tail"), s"got $toks")
    // symbols: one symbol per code point, never per char
    val syms = graft.operators.Bpe.symbols("a𠀋b")
    assert(syms.toSeq == Seq("a", "𠀋", "b</w>"),
      s"got ${syms.toSeq}")
    // encode end-to-end: no output token is a lone surrogate half
    val enc = Seq("x𠀋𪜀 yz").toDF("t")
      .select(graft.operators.Bpe.encode($"t", Seq.empty).as("e"))
      .as[Seq[String]].head()
    assert(enc.forall(s => !s.exists(c => Character.isSurrogate(c) &&
        s.length == 1)), s"broken halves in $enc")
    assert(enc.contains("𠀋</w>"),
      s"the Ext B ideograph must be a standalone word token: $enc")
  }

  test("bpeish token count splits punctuation") {
    val n = Seq("don't stop, now!").toDF("t")
      .select(size(Text.bpeishTokens($"t")).as("n")).as[Int].head()
    assert(n == 7) // don | ' | t | stop | , | now | !
  }
}
