package graft

import graft.functions.{Cleanse, Text}
import graft.operators.Routing
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5.4): generators feed one DataFrame pass per
  * property — totality and invariants over adversarial inputs. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("F1 is total: never null; 19-char format for sane epochs") {
    // (found by this property: epochs beyond year 9999 format with >4
    // digit years — same behavior as the reference's SimpleDateFormat)
    val inputs = sample(Gen.oneOf(
      Gen.numStr, Gen.asciiPrintableStr, Gen.alphaStr,
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_.toString)), 300)
    val out = (inputs :+ null).toDF("s")
      .select($"s", Cleanse.epochMillisToDateTime($"s").as("t"))
      .as[(String, String)].collect()
    assert(out.forall(_._2 != null))
    val sane = out.filter { case (s, _) =>
      s != null && s.matches("-?\\d{1,12}") }
    assert(sane.forall(_._2.length == 19))
  }

  test("routing partitions the input exactly (dims ∪ facts, disjoint)") {
    val keys = sample(Gen.oneOf("a", "b", "c", "d", ""), 200)
    val records = keys.zipWithIndex.toDF("k", "v")
    val config = Routing.configDf(spark, "k",
      Seq(Routing.DimRoute("a", "DIM_A"), Routing.DimRoute("c", "DIM_C")))
    val routed = Routing.routed(records, config, "k", "F")
    val (dims, facts) = Routing.split(routed)
    assert(dims.count() + facts.count() == records.count())
    assert(routed.count() == records.count()) // broadcast join never fans out
    val dimKeys = dims.select("k").distinct().as[String].collect().toSet
    assert(dimKeys.subsetOf(Set("a", "c")))
  }

  test("wordCount matches naive tokenizer on single-spaced text") {
    val word = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val text = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val inputs = sample(text, 200)
    val got = inputs.toDF("t").select(Text.wordCount($"t").as("w")).as[Long].collect()
    inputs.zip(got).foreach { case (s, w) =>
      assert(w == s.split(" ").count(_.nonEmpty), s"for '$s'")
    }
  }

  test("minhash est-similarity of a doc with itself is 1; hamming(x,x)=0") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val text = Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val docs = sample(text, 50).distinct
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val doubled = df.union(df.withColumn("doc_id", $"doc_id" + 1000000L))
    val pairs = graft.operators.Dedup
      .minHashLsh(doubled, "text", "doc_id", estThreshold = 0.999)
      .filter($"id_b" === $"id_a" + 1000000L)
    assert(pairs.count() == docs.length) // every doc pairs with its copy at est 1.0
  }

  test("native shingles equal the HOF form on arbitrary text") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val text = Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.zip(word, sep)).map(_.map { case (w, s) => w + s }.mkString))
    val inputs = sample(text, 200) :+ "" :+ "one" :+ "a b" :+ "a b c" :+
      "a b c d" :+ "\tlead tab a b" :+ "trail c d\n" :+ "a  b   c d" :+ "  "
    val df = inputs.toDF("t")
    Seq(2, 3, 5).foreach { n =>
      val native = df.select(
        graft.expressions.TextSignatures.shingles($"t", n)).as[Seq[String]].collect().toSeq
      val hof = df.select(Text.shingles($"t", n)).as[Seq[String]].collect().toSeq
      assert(native == hof, s"n=$n")
    }
  }

  test("one-pass marker counts equal replace arithmetic on arbitrary text") {
    import graft.functions.TextStats
    // adversarial generator: marker substrings woven into noise, plus
    // unicode and pathological repeats ("aaaa", " a a a ")
    val frag = Gen.oneOf(
      Gen.oneOf(TextStats.allMarkers),
      Gen.oneOf(" ", ".", "..", "的的", "aaa", " a a ", "the", " the"),
      Gen.listOfN(3, Gen.asciiPrintableChar).map(_.mkString))
    val text = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, frag).map(_.mkString))
    val inputs = sample(text, 300)
    val df = inputs.toDF("t").withColumn("_mc", TextStats.counts($"t"))
    TextStats.allMarkers.zipWithIndex.foreach { case (m, i) =>
      val got = df.select(element_at($"_mc", i + 1)).as[Long].collect().toSeq
      val want = df.select(Text.markerCount($"t", m)).as[Long].collect().toSeq
      assert(got == want, s"marker '$m'")
    }
  }

  test("BottomK == sorted.take(k) under arbitrary reduce/merge groupings") {
    import graft.operators.Sampling
    // drive the aggregator directly: random inputs, random k, random
    // partition splits — result must equal the oracle regardless of how
    // rows are distributed between reduce and merge
    val rnd = new scala.util.Random(11)
    (0 until 50).foreach { trial =>
      val k = 1 + rnd.nextInt(6)
      val n = rnd.nextInt(40)
      val rows = (0 until n).map { _ =>
        (rnd.nextInt(8).toString * (1 + rnd.nextInt(2)), rnd.nextLong() % 100)
      }
      val agg = new Sampling.BottomK(k)
      // split into random partitions; reduce within, merge across
      val parts = rows.grouped(math.max(1, 1 + rnd.nextInt(5))).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged)
      val want = rows.sorted.take(k).map(_._2)
      assert(got == want, s"trial $trial k=$k rows=$rows")
    }
  }

  test("TopKHeap == sorted.take(k) under arbitrary insert/merge groupings") {
    import graft.expressions.TopKHeap
    // same adversarial harness as BottomK: the ANN tail aggregate's
    // heap must match the (score desc, id asc) sort oracle for every
    // way rows can be split between partial buffers — including
    // duplicate scores AND duplicate (score, id) pairs
    val rnd = new scala.util.Random(23)
    (0 until 50).foreach { trial =>
      val k = 1 + rnd.nextInt(6)
      val n = rnd.nextInt(40)
      val rows = (0 until n).map { _ =>
        (rnd.nextInt(6).toDouble / 2.0, rnd.nextLong() % 50)
      }
      val parts = rows.grouped(math.max(1, 1 + rnd.nextInt(5))).toSeq
      val merged = parts
        .map { p =>
          val h = new TopKHeap(k)
          p.foreach { case (s, id) => h.insert(s, id) }
          h
        }
        .foldLeft(new TopKHeap(k)) { (acc, h) => acc.mergeFrom(h); acc }
      val got = (0 until merged.n).map(i => (merged.scores(i), merged.ids(i)))
      val want = rows.sortBy { case (s, id) => (-s, id) }.take(k)
      assert(got == want, s"trial $trial k=$k rows=$rows")
    }
  }

  test("MGSummary keeps every heavy item under arbitrary partition/merge groupings") {
    import graft.expressions.MGSummary
    // the two-pass exact heavy hitters (q83) rides entirely on this:
    // for EVERY way rows can split into partial buffers, the merged
    // summary must retain every item with count > n/(k+1), and every
    // counter must be a lower bound within n/(k+1)
    val rnd = new scala.util.Random(41)
    (0 until 50).foreach { trial =>
      val k = 1 + rnd.nextInt(10)
      val n = rnd.nextInt(300)
      // skewed domain: geometric-ish so some items are genuinely heavy
      val rows = (0 until n).map(_ => s"w${(math.log(1 + rnd.nextInt(255)) / math.log(2)).toInt}")
      val parts = rows.grouped(math.max(1, 1 + rnd.nextInt(7))).toSeq
      val merged = parts
        .map { p => val s = new MGSummary(k); p.foreach(s.add); s }
        .foldLeft(new MGSummary(k)) { (acc, s) => acc.mergeFrom(s); acc }
      assert(merged.total == n, s"trial $trial")
      assert(merged.counts.size <= k, s"trial $trial overflow")
      val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val entries = merged.sortedEntries.toMap
      val bound = merged.total / (k + 1)
      truth.filter(_._2 > bound).keys.foreach(w =>
        assert(entries.contains(w), s"trial $trial k=$k lost heavy $w"))
      entries.foreach { case (w, lb) =>
        assert(lb <= truth(w) && lb >= truth(w) - bound,
          s"trial $trial k=$k $w lb=$lb true=${truth(w)}")
      }
    }
  }

  test("chunking reconstructs any text exactly at any size/step") {
    import graft.operators.Chunking
    val text = Gen.oneOf(
      Gen.asciiPrintableStr, Gen.alphaStr,
      Gen.listOf(Gen.oneOf(" ", "ab", ".")).map(_.mkString))
    val inputs = sample(text, 120).filter(_.nonEmpty).distinct
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 5) {
      val step = 1 + rnd.nextInt(9)
      val size = step + rnd.nextInt(9)
      val df = inputs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val chunks = Chunking.chunk(df, "text", size, step, Seq("doc_id"))
        .select("doc_id", "chunk_idx", "chunk_text")
        .as[(Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
      inputs.zipWithIndex.foreach { case (t, i) =>
        val cs = chunks(i.toLong)
        assert(cs.length == (t.length - 1) / step + 1, s"size=$size step=$step")
        val rebuilt = cs.init.map(_.take(step)).mkString + cs.last
        assert(rebuilt == t, s"size=$size step=$step text=${t.take(40)}")
      }
    }
  }
}
