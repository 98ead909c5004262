package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[IncrementalExcision]] — span excision at ingest: the monotone
  * approximation of the corpus-global batch door. Pins (a) the lag
  * law (the first minDf−1 carriers of a template pass uncleaned;
  * every later carrier arrives cleaned), (b) never-over-cut vs the
  * batch door, (c) cross-batch accumulation through the postings
  * store, (d) the global re-excision reconcile. */
class IncrementalExcisionSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_iex_").toString

  private val template = "t1 t2 t3 t4" // k=4 gram shared across docs

  test("ingest excision: hotness accumulates across batches, the " +
    "first carrier lags, later carriers arrive cleaned") {
    implicit val sc = spark.sqlContext
    val work = tmp()
    val store = s"$work/store"
    val out = s"$work/out"
    val in = MemoryStream[(Long, String)]
    val q = IncrementalExcision.run(spark,
      in.toDF().toDF("doc_id", "text"), store, out, s"$work/ckpt",
      k = 4, minDf = 2L)
    try {
      // batch 1: one template carrier (df=1 < minDf) + a unique doc
      in.addData((1L, s"u1 $template u2"), (2L, "solo words only here"))
      q.processAllAvailable()
      // batch 2: second carrier -> df reaches 2 AT ITS ARRIVAL
      in.addData((3L, s"w1 w2 $template"))
      q.processAllAvailable()
      // batch 3: third carrier, template long hot
      in.addData((4L, s"$template tail4"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    // doc 1 arrived before hotness: uncleaned (the documented lag)
    assert(got(1L) == ((s"u1 $template u2", 0L)), s"doc1 ${got(1L)}")
    assert(got(2L)._2 == 0L)
    // docs 3 and 4 arrived at/after df=2: template excised
    assert(got(3L) == (("w1 w2", 4L)), s"doc3 ${got(3L)}")
    assert(got(4L) == (("tail4", 4L)), s"doc4 ${got(4L)}")

    // never-over-cut: everything the ingest cut, the batch door over
    // the same corpus also cuts (subset by position count per doc)
    val corpus = Seq(
      (1L, s"u1 $template u2"), (2L, "solo words only here"),
      (3L, s"w1 w2 $template"), (4L, s"$template tail4"))
      .toDF("doc_id", "text")
    val batchDoor = graft.operators.Dedup
      .exciseSharedSpans(corpus, "text", "doc_id", k = 4, minDf = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    got.foreach { case (id, (_, nRemoved)) =>
      assert(nRemoved <= batchDoor(id),
        s"doc $id: ingest cut $nRemoved > batch ${batchDoor(id)}")
    }
    // reconcile: the batch door retires doc 1's lag debt
    assert(batchDoor(1L) == 4L,
      "global re-excision must clean the lagged first carrier")
  }

  test("replayed batches are harmless: re-processing a batch does " +
    "not inflate df (batch-keyed partials, max-dedup, strictly-before " +
    "model read) and re-emits bit-identical rows") {
    val work = tmp()
    val store = s"$work/store"
    val out = s"$work/out"
    val b1 = Seq((1L, s"$template a")).toDF("doc_id", "text")
    // the same batch processed twice (at-least-once replay): one doc
    // carrying the template must NOT become df=2
    IncrementalExcision.processBatch(spark, b1, 0L, store, out,
      "text", "doc_id", k = 4, minDf = 2L)
    IncrementalExcision.processBatch(spark, b1, 0L, store, out,
      "text", "doc_id", k = 4, minDf = 2L)
    val outs = spark.read.parquet(out).collect()
      .map(r => (r.getString(1), r.getLong(3)))
    assert(outs.length == 2 && outs.forall(_ == ((s"$template a", 0L))),
      s"replay must not trip hotness and must re-emit identical rows: " +
        s"${outs.toSeq}")
    // the store holds duplicate (batch, gram, df) partials — later
    // reads max-collapse them, so df stays 1 per gram as of batch 1
    val perGram = spark.read.parquet(store)
      .groupBy("_f1", "_f2", "batch_id").count().collect()
    assert(perGram.forall(_.getLong(3) == 2L), "both appends present")
    // a genuine second carrier then trips it
    IncrementalExcision.processBatch(spark,
      Seq((2L, s"b $template")).toDF("doc_id", "text"), 1L, store, out,
      "text", "doc_id", k = 4, minDf = 2L)
    val doc2 = spark.read.parquet(out).filter(col("id") === 2L)
      .collect().head
    assert(doc2.getString(1) == "b" && doc2.getLong(3) == 4L)
  }

  test("df partials: the store holds one row per (batch, distinct " +
    "gram), not one per (gram, doc) posting") {
    val work = tmp()
    // one doc repeating the template 5 times: 5+ gram POSITIONS but
    // each distinct gram contributes ONE partial row with df=1
    val rep = (s"$template " * 5).trim
    IncrementalExcision.processBatch(spark,
      Seq((1L, rep), (2L, rep)).toDF("doc_id", "text"), 0L,
      s"$work/store", s"$work/out", "text", "doc_id", k = 4, minDf = 2L)
    val storeRows = spark.read.parquet(s"$work/store")
    val grams = storeRows.select("_f1", "_f2").distinct().count()
    assert(storeRows.count() == grams,
      "one partial row per distinct gram per batch")
    // and df counted distinct DOCS (2), not positions (10)
    assert(storeRows.agg(max("_df")).head.getLong(0) == 2L)
  }
}
