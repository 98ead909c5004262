package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[IncrementalDsir]] — DSIR weights at ingest. Pins (a) the
  * model-as-of-arrival law (early weights differ, the LAST batch's
  * weights equal the batch door's over the same corpus — exactly),
  * (b) count-store replay idempotence (the batch-keyed max-collapse),
  * (c) the nBuckets > 0 requirement. */
class IncrementalDsirSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_idsir_").toString

  test("model accumulates across batches; the last batch's weights " +
    "equal the batch door's (model-as-of-arrival, exact at the tail)") {
    implicit val sc = spark.sqlContext
    val work = tmp()
    val in = MemoryStream[(Long, String, String)]
    val q = IncrementalDsir.run(spark,
      in.toDF().toDF("doc_id", "lang", "text"),
      s"$work/store", s"$work/out", s"$work/ckpt",
      isTarget = col("lang") === "en", nBuckets = 64)
    val rows = Seq(
      (1L, "en", "alpha beta gamma alpha"),
      (2L, "de", "delta epsilon beta"),
      (3L, "en", "alpha zeta zeta"),
      (4L, "de", "gamma gamma eta theta"))
    try {
      in.addData(rows(0), rows(1))
      q.processAllAvailable()
      in.addData(rows(2), rows(3))
      q.processAllAvailable()
    } finally q.stop()

    val inc = spark.read.parquet(s"$work/out").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(inc.keySet == Set(1L, 2L, 3L, 4L))
    // the batch door over the full corpus, same buckets
    val full = graft.operators.Dsir.importanceWeightsWhen(
        rows.toDF("doc_id", "lang", "text"), col("lang") === "en",
        nBuckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // last batch (docs 3, 4): model-as-of-arrival IS the full model
    assert(inc(3L) == full(3L), s"doc3 inc=${inc(3L)} full=${full(3L)}")
    assert(inc(4L) == full(4L), s"doc4 inc=${inc(4L)} full=${full(4L)}")
    // n_tokens agree everywhere (model-independent)
    inc.foreach { case (id, (n, _)) => assert(n == full(id)._1) }
    // the early batch was weighed under a SMALLER model — the
    // documented deviation (doc 1 saw only batch-1 counts)
    assert(inc(1L)._2 != full(1L)._2,
      "early-batch weights reflect the model as of arrival, " +
        "not the final model")
  }

  test("replayed batch cannot inflate the count store (batch-keyed " +
    "max-collapse); nBuckets = 0 is refused") {
    val work = tmp()
    val b = Seq((1L, "en", "alpha alpha beta")).toDF("doc_id", "lang", "text")
    IncrementalDsir.processBatch(spark, b, 0L, s"$work/store",
      s"$work/out", col("lang") === "en", "text", "doc_id", nBuckets = 64)
    // replay batch 0 (at-least-once): identical rows re-append
    IncrementalDsir.processBatch(spark, b, 0L, s"$work/store",
      s"$work/out", col("lang") === "en", "text", "doc_id", nBuckets = 64)
    // a new batch weighed now must see c_r(alpha-bucket) = 2, not 4
    IncrementalDsir.processBatch(spark,
      Seq((2L, "de", "alpha")).toDF("doc_id", "lang", "text"),
      1L, s"$work/store", s"$work/out",
      col("lang") === "en", "text", "doc_id", nBuckets = 64)
    val w2 = spark.read.parquet(s"$work/out")
      .filter(col("doc_id") === 2L).collect().head.getLong(2)
    // replicate by hand: counts alpha=3 (2+1), beta=1; targets 2/1;
    // doc2 = 1 token of alpha-bucket
    val expect = graft.operators.Dsir.importanceWeightsWhen(
        Seq((1L, "en", "alpha alpha beta"), (2L, "de", "alpha"))
          .toDF("doc_id", "lang", "text"),
        col("lang") === "en", nBuckets = 64)
      .filter(col("doc_id") === 2L).collect().head.getLong(2)
    assert(w2 == expect,
      s"replay inflated the model: got $w2, uninflated law says $expect")
    // the round-15 advisor's medium: the REPLAYED attempt itself must
    // re-emit bit-identical output rows — its model read excludes the
    // first attempt's half-committed store generation (batch_id <
    // batchId), so both attempts weigh doc 1 under the same (empty ⊕
    // own-counts) model. Two appends, ONE distinct row.
    val doc1 = spark.read.parquet(s"$work/out")
      .filter(col("doc_id") === 1L)
    assert(doc1.count() == 2L, "both attempts appended")
    assert(doc1.distinct().count() == 1L,
      "replayed attempt emitted different rows than the first — " +
        "the model-as-of-first-arrival contract is broken")
    intercept[IllegalArgumentException] {
      IncrementalDsir.processBatch(spark, b, 9L, s"$work/store",
        s"$work/out", col("lang") === "en", "text", "doc_id", nBuckets = 0)
    }
  }

  test("readWeights: replay + consumer read ≡ no-replay read (the " +
    "set-semantics contract, executable)") {
    val wA = tmp(); val wB = tmp()
    val b0 = Seq((1L, "en", "alpha alpha beta"),
      (2L, "de", "gamma alpha")).toDF("doc_id", "lang", "text")
    val b1 = Seq((3L, "en", "beta beta gamma"))
      .toDF("doc_id", "lang", "text")
    def drive(w: String, replayB1: Boolean): Unit = {
      IncrementalDsir.processBatch(spark, b0, 0L, s"$w/store",
        s"$w/out", col("lang") === "en", "text", "doc_id", nBuckets = 64)
      IncrementalDsir.processBatch(spark, b1, 1L, s"$w/store",
        s"$w/out", col("lang") === "en", "text", "doc_id", nBuckets = 64)
      if (replayB1) // at-least-once window: batch 1 delivered again
        IncrementalDsir.processBatch(spark, b1, 1L, s"$w/store",
          s"$w/out", col("lang") === "en", "text", "doc_id",
          nBuckets = 64)
    }
    drive(wA, replayB1 = false)
    drive(wB, replayB1 = true)
    assert(spark.read.parquet(s"$wB/out").count() >
      spark.read.parquet(s"$wA/out").count(),
      "precondition: the replay really appended duplicates")
    val a = IncrementalDsir.readWeights(spark, s"$wA/out")
      .collect().map(_.toSeq).toSet
    val b = IncrementalDsir.readWeights(spark, s"$wB/out")
      .collect().map(_.toSeq).toSet
    assert(a == b, "the consumer door must fold replays out exactly")
  }

  test("run(collapseEvery): the streaming wiring collapses at the " +
    "batch boundary and weights keep matching the uncollapsed law") {
    implicit val sc = spark.sqlContext
    val work = tmp()
    val in = MemoryStream[(Long, String, String)]
    val q = IncrementalDsir.run(spark,
      in.toDF().toDF("doc_id", "lang", "text"),
      s"$work/store", s"$work/out", s"$work/ckpt",
      isTarget = col("lang") === "en", nBuckets = 64,
      collapseEvery = 2)
    val batches = Seq(
      Seq((1L, "en", "alpha beta"), (2L, "de", "beta gamma")),
      Seq((3L, "en", "gamma delta")),
      Seq((4L, "de", "alpha epsilon")),
      Seq((5L, "en", "delta delta zeta")))
    try {
      batches.foreach { rows => in.addData(rows: _*); q.processAllAvailable() }
    } finally q.stop()
    // collapses fired at batches 2 (thru=1): the store's history
    // below the newest watermark is one sentinel generation
    val ids = spark.read.parquet(s"$work/store")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids.exists(_ < 0), s"no sentinel generation in store: $ids")
    // last batch's weights equal the batch door over the full corpus
    // (the model-as-of-arrival tail law, THROUGH the collapse)
    val inc = spark.read.parquet(s"$work/out").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val full = graft.operators.Dsir.importanceWeightsWhen(
        batches.flatten.toDF("doc_id", "lang", "text"),
        col("lang") === "en", nBuckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(inc(5L) == full(5L),
      s"tail law broke through the collapse: inc=${inc(5L)} full=${full(5L)}")
  }

  test("collapseStore: N batches + collapse + replay ≡ uncollapsed " +
    "model; store rows bound to the bucket count; crash windows " +
    "(sentinel-appended-deletes-pending, replayed collapse) exact") {
    val work = tmp()   // collapsed store
    val workU = tmp()  // uncollapsed twin — the ≡ oracle
    def step(rows: Seq[(Long, String, String)], id: Long, w: String): Unit =
      IncrementalDsir.processBatch(spark,
        rows.toDF("doc_id", "lang", "text"), id, s"$w/store", s"$w/out",
        col("lang") === "en", "text", "doc_id", nBuckets = 64)
    val batches = Seq(
      Seq((1L, "en", "alpha beta gamma"), (2L, "de", "beta gamma")),
      Seq((3L, "en", "gamma gamma delta")),
      Seq((4L, "de", "alpha delta epsilon")))
    batches.zipWithIndex.foreach { case (rows, i) =>
      step(rows, i.toLong, work); step(rows, i.toLong, workU)
    }
    val (before, after) =
      IncrementalDsir.collapseStore(spark, s"$work/store", 3L)
    assert(before > after,
      s"collapse must shrink the store (rows $before -> $after)")
    // post-collapse rows = ONE sentinel generation = live buckets
    val store = spark.read.parquet(s"$work/store")
    assert(after == store.select("w").distinct().count(),
      "steady-state store = one row per live bucket")
    assert(store.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(-3L),
      "sentinel batch_id encodes the watermark: -(thru+1) = -3")
    // batch 3 under collapsed vs uncollapsed stores: identical rows
    val b3 = Seq((5L, "en", "beta delta zeta"))
    step(b3, 3L, work); step(b3, 3L, workU)
    def rowsOf(w: String) = spark.read.parquet(s"$w/out")
      .filter(col("doc_id") === 5L).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rowsOf(work) == rowsOf(workU),
      "collapsed model diverged from the uncollapsed law")
    // replay of batch 3 over the collapsed store: identical rows again
    step(b3, 3L, work)
    val doc5 = spark.read.parquet(s"$work/out")
      .filter(col("doc_id") === 5L)
    assert(doc5.count() == 2L && doc5.distinct().count() == 1L,
      "replay over a collapsed store must re-emit identical rows")
    // crash window: a REPLAYED collapse (same watermark) — sentinel
    // appended twice, deletes already done. Reader must max-collapse
    // the duplicate sentinel, and the next collapse reclaims it.
    IncrementalDsir.collapseStore(spark, s"$work/store", 3L)
    IncrementalDsir.collapseStore(spark, s"$work/store", 3L)
    val b4 = Seq((6L, "de", "alpha zeta"))
    step(b4, 4L, work); step(b4, 4L, workU)
    def rows6(w: String) = spark.read.parquet(s"$w/out")
      .filter(col("doc_id") === 6L).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows6(work) == rows6(workU),
      "duplicate sentinel inflated the model")
    // and a LATER collapse folds sentinel + newer generations into a
    // fresh sentinel with the advanced watermark
    val (_, after2) = IncrementalDsir.collapseStore(spark, s"$work/store", 5L)
    val store2 = spark.read.parquet(s"$work/store")
    assert(store2.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(-5L),
      "re-collapse advances the sentinel watermark to -(4+1)")
    assert(after2 == store2.select("w").distinct().count())
    val b5 = Seq((7L, "en", "epsilon epsilon"))
    step(b5, 5L, work); step(b5, 5L, workU)
    def rows7(w: String) = spark.read.parquet(s"$w/out")
      .filter(col("doc_id") === 7L).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows7(work) == rows7(workU),
      "advanced-watermark collapse diverged from the uncollapsed law")
  }
}
