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

  // ---- round 17: history collapse (sealed multi-file sentinel) ----

  /** Drives the same deterministic batches through two stores. */
  private def driveBatches(store: String, out: String,
                           collapseAt: Set[Int]): Unit = {
    val batches = Seq(
      Seq((1L, s"u1 $template u2"), (2L, "solo words only here")),
      Seq((3L, s"w1 w2 $template"), (5L, "x1 x2 x3 x4 x5")),
      Seq((4L, s"$template tail4"), (6L, s"y0 $template y9")),
      Seq((7L, s"z1 $template"), (8L, "plain text no dups here")))
    batches.zipWithIndex.foreach { case (rows, b) =>
      if (collapseAt(b))
        IncrementalExcision.collapseStore(spark, store, b.toLong)
      IncrementalExcision.processBatch(spark,
        rows.toDF("doc_id", "text"), b.toLong, store, out,
        "text", "doc_id", k = 4, minDf = 2L)
    }
  }

  private def outRows(out: String): Seq[(Long, String, Long, Long, Long)] =
    spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._5)).toSeq

  test("collapseStore: collapsed and uncollapsed stores produce " +
    "bit-identical excision output, and the collapsed store's row " +
    "count drops to sentinel + recent") {
    val wA = tmp(); val wB = tmp()
    driveBatches(s"$wA/store", s"$wA/out", collapseAt = Set.empty)
    driveBatches(s"$wB/store", s"$wB/out", collapseAt = Set(2))
    assert(outRows(s"$wA/out") == outRows(s"$wB/out"),
      "collapse must not change any cleaned row")
    // resolved views agree gram-for-gram
    val dfOf = (s: String) => IncrementalExcision.readStore(spark, s).get
      .groupBy("batch_id", "_f1", "_f2").agg(max("_df").as("_df"))
      .groupBy("_f1", "_f2").agg(sum("_df").as("_df"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(dfOf(s"$wA/store") == dfOf(s"$wB/store"))
    // and the collapsed store superseded its pre-watermark generations:
    // only the sentinel (batch_id = -(thru+1) = -2) plus batches 2, 3
    val gens = IncrementalExcision.readStore(spark, s"$wB/store").get
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(gens == Set(-2L, 2L, 3L), s"generations after collapse: $gens")
  }

  test("collapse crash windows: superseded flat files lingering after " +
    "a crashed delete change nothing; an unsealed sentinel stage is " +
    "invisible; a replayed collapse is idempotent") {
    val w = tmp()
    val store = s"$w/store"
    driveBatches(store, s"$w/out", collapseAt = Set.empty)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val storeP = new org.apache.hadoop.fs.Path(store)
    // stash the flat generation files (so we can simulate the
    // crash-between-seal-and-delete window by restoring them)
    val stash = new org.apache.hadoop.fs.Path(s"$w/stash")
    fs.mkdirs(stash)
    val flats = fs.listStatus(storeP).filter(st => st.isFile &&
      st.getPath.getName.endsWith(".parquet")).map(_.getPath)
    flats.foreach(f => org.apache.hadoop.fs.FileUtil.copy(
      fs, f, fs, new org.apache.hadoop.fs.Path(stash, f.getName),
      false, spark.sparkContext.hadoopConfiguration))
    val clean = IncrementalExcision.readStore(spark, store).get
      .collect().map(_.toSeq).toSet
    IncrementalExcision.collapseStore(spark, store, 4L)
    val collapsed = IncrementalExcision.readStore(spark, store).get
    // crash window: restore the superseded files the delete "missed"
    fs.listStatus(stash).foreach(st =>
      org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
        new org.apache.hadoop.fs.Path(storeP, st.getPath.getName),
        false, spark.sparkContext.hadoopConfiguration))
    val lingering = IncrementalExcision.readStore(spark, store).get
    val dfView = (d: org.apache.spark.sql.DataFrame) =>
      d.groupBy("batch_id", "_f1", "_f2").agg(max("_df").as("_df"))
        .groupBy("_f1", "_f2").agg(sum("_df").as("_df"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    assert(dfView(lingering) == dfView(collapsed),
      "superseded flat rows must fail the watermark gate")
    assert(dfView(collapsed) == dfView(spark.createDataFrame(
        spark.sparkContext.parallelize(
          clean.toSeq.map(s => org.apache.spark.sql.Row.fromSeq(s))),
        collapsed.schema)),
      "collapse must preserve the exact pre-collapse df view")
    // unsealed stage: a crashed stage dir (no _SUCCESS) is ignored
    val bogus = Seq((-100L, 1L, 1L, 999L))
      .toDF("batch_id", "_f1", "_f2", "_df")
    bogus.write.parquet(s"$store/_collapse_99")
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$store/_collapse_99/_SUCCESS"), false)
    assert(dfView(IncrementalExcision.readStore(spark, store).get)
      == dfView(collapsed), "unsealed sentinel must be invisible")
    // replayed collapse at the same boundary: finds the sealed dir,
    // retries the supersession sweep, output identical (the bogus
    // unsealed stage and restored flats are swept)
    IncrementalExcision.collapseStore(spark, store, 4L)
    assert(dfView(IncrementalExcision.readStore(spark, store).get)
      == dfView(collapsed))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$store/_collapse_99")), "stale unsealed stage swept")
  }

  test("collapse at the boundary of an in-flight batch: its replay " +
    "leftovers are carried forward, the replay re-emits bit-identical " +
    "rows and df is not inflated") {
    val w = tmp()
    val store = s"$w/store"
    val out = s"$w/out"
    val b0 = Seq((1L, s"$template a")).toDF("doc_id", "text")
    val b1 = Seq((2L, s"b $template")).toDF("doc_id", "text")
    val b2 = Seq((3L, s"c3 $template c4")).toDF("doc_id", "text")
    IncrementalExcision.processBatch(spark, b0, 0L, store, out,
      "text", "doc_id", k = 4, minDf = 3L)
    IncrementalExcision.processBatch(spark, b1, 1L, store, out,
      "text", "doc_id", k = 4, minDf = 3L)
    // batch 2 ran once (store append done, checkpoint commit lost)
    IncrementalExcision.processBatch(spark, b2, 2L, store, out,
      "text", "doc_id", k = 4, minDf = 3L)
    // restart replays batch 2; the collapse boundary fires FIRST with
    // batchId = 2 — thru = 1, batch 2's leftover partials carried live
    IncrementalExcision.collapseStore(spark, store, 2L)
    IncrementalExcision.processBatch(spark, b2, 2L, store, out,
      "text", "doc_id", k = 4, minDf = 3L)
    // doc 3 was the template's 3rd carrier → hot AS OF its arrival on
    // BOTH attempts (model = batches 0,1 strictly before 2, replay
    // leftovers excluded): both rows identical and excised
    val doc3 = spark.read.parquet(out).filter(col("id") === 3L)
      .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(4)))
    assert(doc3.length == 2 && doc3.forall(_ == (("c3 c4", 4L, 2L))),
      s"replay across the collapse boundary must be bit-identical: " +
        s"${doc3.toSeq}")
    // and the canonical consumer folds the replay out
    val cleaned = IncrementalExcision.readCleaned(spark, out)
    assert(cleaned.count() == 3L)
    assert(cleaned.filter(col("id") === 3L).count() == 1L)
  }

  test("run(collapseEvery): the streaming wiring collapses at the " +
    "batch boundary — a sealed sentinel appears, flat generations " +
    "are superseded, and cleaned output keeps matching the " +
    "uncollapsed pipeline") {
    implicit val sc = spark.sqlContext
    val w = tmp()
    val store = s"$w/store"
    val out = s"$w/out"
    val in = MemoryStream[(Long, String)]
    val q = IncrementalExcision.run(spark,
      in.toDF().toDF("doc_id", "text"), store, out, s"$w/ckpt",
      k = 4, minDf = 2L, collapseEvery = 2)
    val feed = Seq(
      Seq((1L, s"u1 $template u2"), (2L, "solo words only here")),
      Seq((3L, s"w1 w2 $template"), (5L, "x1 x2 x3 x4 x5")),
      Seq((4L, s"$template tail4"), (6L, s"y0 $template y9")),
      Seq((7L, s"z1 $template"), (8L, "plain text no dups here")))
    try {
      feed.foreach { rows => in.addData(rows: _*); q.processAllAvailable() }
    } finally q.stop()
    // the boundary collapse fired (at batch 2, again not at 3): one
    // sealed sentinel with watermark 1
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$store/_collapse_1/_SUCCESS")), "sealed sentinel missing")
    val gens = IncrementalExcision.readStore(spark, store).get
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(gens == Set(-2L, 2L, 3L), s"generations: $gens")
    // cleaned rows ≡ the same batches driven without collapse
    val wP = tmp()
    driveBatches(s"$wP/store", s"$wP/out", collapseAt = Set.empty)
    assert(IncrementalExcision.readCleaned(spark, out)
        .collect().map(_.toSeq).toSet ==
      IncrementalExcision.readCleaned(spark, s"$wP/out")
        .collect().map(_.toSeq).toSet,
      "streaming-wired collapse changed cleaned output")
  }

  test("readCleaned: replay + consumer read ≡ no-replay read " +
    "(set semantics, executable)") {
    val wA = tmp(); val wB = tmp()
    driveBatches(s"$wA/store", s"$wA/out", collapseAt = Set.empty)
    driveBatches(s"$wB/store", s"$wB/out", collapseAt = Set(2))
    // force a replay of batch 3 on B (at-least-once window) — only
    // batches AT/ABOVE the collapse watermark can replay (committed
    // checkpoints never re-deliver; run() collapses at the boundary
    // so thru = batchId−1 stays strictly below every replayable batch)
    IncrementalExcision.processBatch(spark,
      Seq((7L, s"z1 $template"), (8L, "plain text no dups here"))
        .toDF("doc_id", "text"), 3L, s"$wB/store", s"$wB/out",
      "text", "doc_id", k = 4, minDf = 2L)
    val a = IncrementalExcision.readCleaned(spark, s"$wA/out")
      .collect().map(_.toSeq).toSet
    val b = IncrementalExcision.readCleaned(spark, s"$wB/out")
      .collect().map(_.toSeq).toSet
    assert(a == b, "the consumer door must fold replays out exactly")
  }

  test("selfCheckDocIds: a doc re-arriving in a LATER batch is " +
    "refused loudly; a replay of the SAME batch is not") {
    val w = tmp()
    val store = s"$w/store"
    val out = s"$w/out"
    val b0 = Seq((1L, s"$template a"), (2L, "other words entirely"))
      .toDF("doc_id", "text")
    IncrementalExcision.processBatch(spark, b0, 0L, store, out,
      "text", "doc_id", k = 4, minDf = 2L, selfCheckDocIds = true)
    // replay of batch 0: first-attempt rows carry batch_id == 0,
    // excluded by the strictly-before probe — no false positive
    IncrementalExcision.processBatch(spark, b0, 0L, store, out,
      "text", "doc_id", k = 4, minDf = 2L, selfCheckDocIds = true)
    // genuine re-arrival of doc 1 in batch 1: contract violation
    val err = intercept[IllegalArgumentException] {
      IncrementalExcision.processBatch(spark,
        Seq((1L, s"$template again")).toDF("doc_id", "text"), 1L,
        store, out, "text", "doc_id", k = 4, minDf = 2L,
        selfCheckDocIds = true)
    }
    assert(err.getMessage.contains("one-batch-per-doc"))
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
