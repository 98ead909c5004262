package graft.operators

import graft.{SparkTestBase, Tables}
import graft.expressions.MGSummary
import org.apache.spark.sql.functions._

/** Misra–Gries sketch + two-pass exact heavy hitters (q83). */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val tok = Tables(spark, sf).documents
    .select(explode(graft.functions.Text.tokens($"text")).as("w"))

  test("MGSummary: superset guarantee and lower-bound error on an adversarial stream") {
    // 3 heavy items amid a long tail, capacity far below the domain
    val heavy = Seq.fill(400)("a") ++ Seq.fill(300)("b") ++ Seq.fill(250)("c")
    val tail = (0 until 600).map(i => s"t$i")
    val stream = scala.util.Random.shuffle(heavy ++ tail ++ tail) // n = 2150
    val k = 8
    val s = new MGSummary(k)
    stream.foreach(s.add)
    assert(s.total == stream.length)
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val entries = s.sortedEntries.toMap
    val bound = s.total / (k + 1)
    // every item above n/(k+1) is retained
    truth.filter(_._2 > bound).keys.foreach(w =>
      assert(entries.contains(w), s"heavy item $w missing"))
    // every counter is a lower bound within n/(k+1)
    entries.foreach { case (w, lb) =>
      assert(lb <= truth(w), s"$w lb=$lb over true ${truth(w)}")
      assert(lb >= truth(w) - bound, s"$w lb=$lb under bound")
    }
  }

  test("MGSummary: merge preserves totals and the superset guarantee") {
    val part1 = Seq.fill(300)("x") ++ (0 until 200).map(i => s"p$i")
    val part2 = Seq.fill(280)("y") ++ Seq.fill(150)("x") ++ (0 until 200).map(i => s"q$i")
    val k = 8
    val a = new MGSummary(k); part1.foreach(a.add)
    val b = new MGSummary(k); part2.foreach(b.add)
    a.mergeFrom(b)
    assert(a.total == part1.length + part2.length)
    assert(a.counts.size <= k)
    val truth = (part1 ++ part2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val entries = a.sortedEntries.toMap
    val bound = a.total / (k + 1)
    truth.filter(_._2 > bound).keys.foreach(w =>
      assert(entries.contains(w), s"heavy item $w lost in merge"))
    entries.foreach { case (w, lb) => assert(lb <= truth(w)) }
  }

  test("sketch aggregate: distributed candidates cover every above-threshold token") {
    val k = 64
    val row = tok.agg(HeavyHitters.sketch($"w", k).as("s"))
      .select($"s.n", $"s.items.item").as[(Long, Seq[String])].head()
    val (n, cand) = row
    assert(n == tok.count())
    assert(cand.size <= k)
    val truth = tok.groupBy("w").count().as[(String, Long)].collect().toMap
    truth.filter(_._2 > n / (k + 1)).keys.foreach(w =>
      assert(cand.contains(w), s"token $w above n/(k+1) not a candidate"))
  }

  test("heavy_hitters_sketch SQL surface matches the Column aggregate") {
    Tables(spark, sf).documents.createOrReplaceTempView("hh_docs")
    val viaSql = spark.sql(
      """SELECT s.n AS n, s.items.item AS cand FROM (
        |  SELECT heavy_hitters_sketch(w, 64) AS s FROM (
        |    SELECT explode(split(trim(text), '\\s+')) AS w FROM hh_docs))
        |""".stripMargin).as[(Long, Seq[String])].head()
    val viaCol = tok.agg(HeavyHitters.sketch($"w", 64).as("s"))
      .select($"s.n", $"s.items.item").as[(Long, Seq[String])].head()
    assert(viaSql == viaCol)
  }

  test("exactAboveShare: exactly the GROUP BY / HAVING answer") {
    val got = HeavyHitters.exactAboveShare(tok, "w", 34, 1000, sketchK = 512)
      .as[(String, Long)].collect().toMap
    val n = tok.count()
    val want = tok.groupBy("w").count().as[(String, Long)].collect()
      .filter { case (_, c) => c * 1000 > 34 * n }.toMap
    assert(got == want)
    assert(want.nonEmpty, "threshold should be discriminative on the fixture")
    // and discriminative the other way: not every token passes
    assert(want.size < tok.select("w").distinct().count())
  }

  test("exactAboveShare: tiny capacity still exact when the guarantee holds") {
    // share > 1/3 with k=8: 8+1 > 3 — guarantee holds even at k=8
    val items = (Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++
      (0 until 30).map(i => s"cold$i")).toDF("it")
    val got = HeavyHitters.exactAboveShare(items, "it", 1, 3, sketchK = 8)
      .as[(String, Long)].collect().toMap
    assert(got == Map("hot" -> 50L)) // 50/100 > 1/3; warm 20/100 is not
  }

  test("sketch aggregate runs under Structured Streaming (complete-mode candidates)") {
    // the streaming shape of the candidate pass: the MG summary is a
    // mergeable aggregation buffer, so complete-mode streaming
    // aggregation maintains candidates incrementally across batches
    implicit val sc = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val agg = in.toDF().toDF("w")
      .agg(HeavyHitters.sketch($"w", 4).as("s"))
      .select($"s.n".as("n"), $"s.items.item".as("cand"))
    val q = agg.writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    in.addData(Seq.fill(30)("hot") ++ Seq("a", "b", "c"): _*)
    q.processAllAvailable()
    val r1 = spark.table("hh_stream").as[(Long, Seq[String])].head()
    assert(r1._1 == 33L && r1._2.contains("hot"))
    in.addData(Seq.fill(25)("warm") ++ Seq("d", "e"): _*)
    q.processAllAvailable(); q.stop()
    val r2 = spark.table("hh_stream").as[(Long, Seq[String])].head()
    assert(r2._1 == 60L, s"running total across batches, got ${r2._1}")
    assert(r2._2.contains("hot") && r2._2.contains("warm"),
      s"both heavy items survive the incremental merge: ${r2._2}")
  }

  test("exactAboveShare: refuses a capacity below the guarantee; empty input yields empty") {
    val items = Seq("a").toDF("it")
    intercept[IllegalArgumentException] {
      HeavyHitters.exactAboveShare(items, "it", 1, 100, sketchK = 50)
    }
    val empty = HeavyHitters.exactAboveShare(items.limit(0), "it", 1, 3, sketchK = 8)
    assert(empty.collect().isEmpty)
    assert(empty.columns.toSeq == Seq("it", "cnt"))
  }
}
