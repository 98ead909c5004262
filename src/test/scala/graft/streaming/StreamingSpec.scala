package graft.streaming

import graft.SparkTestBase
import graft.sinks.Sinks
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_stream_").toString

  test("ODS->DWD e2e: browse-log envelope, cleanse, memory sink") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, Map[String, String])]
    val logs = in.toDF().toDF("logtype", "data")
    val ods = Pipelines.odsBrowseLog(logs, "KAFKA-DWD-BROWSE-LOG-TOPIC")
    val dwd = Pipelines.dwdCleanse(ods,
      requiredCols = Seq("user_id"), tsCols = Seq("log_time"))
    val q = dwd.writeStream.format("memory").queryName("dwd_out")
      .outputMode("append").start()
    in.addData(
      ("browselog", Map(
        "logTime" -> "1655274222161", "userId" -> "uid813665",
        "userIp" -> "30.121.149.246", "obtainPoints" -> "42",
        "browseProductCode" -> "demHQ6TADV", "browseProductTpCode" -> "14000",
        "frontProductUrl" -> "", "browseProductUrl" -> "https://x/y")),
      ("otherlog", Map("userId" -> "drop-me")),
      ("browselog", Map("logTime" -> null, "userId" -> "uid2")))
    q.processAllAvailable(); q.stop()
    val out = spark.table("dwd_out").orderBy("user_id")
    val rows = out.select("user_id", "log_time", "iceberg_ods_tbl_name", "kafka_dwd_topic")
      .as[(String, String, String, String)].collect()
    assert(rows.length == 2) // non-browselog dropped
    assert(rows(0) == ("uid2", "1970-01-01 00:00:00", "ODS_BROWSELOG", "KAFKA-DWD-BROWSE-LOG-TOPIC"))
    assert(rows(1)._2 == "2022-06-15 06:23:42")
  }

  test("DWS enrich: stream-static broadcast left join keeps unmatched facts") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val facts = in.toDF().toDF("user_id", "ip")
    val dim = Seq(("uid1", "4", "9371")).toDF("uid", "member_level", "member_points")
    val wide = Pipelines.dwsEnrich(facts, Seq((dim, "user_id", "uid")))
    val q = wide.writeStream.format("memory").queryName("dws_out")
      .outputMode("append").start()
    in.addData(("uid1", "1.2.3.4"), ("uid-miss", "5.6.7.8"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("dws_out").orderBy("user_id")
      .as[(String, String, Option[String], Option[String])].collect()
    assert(rows.toSeq == Seq(
      ("uid-miss", "5.6.7.8", None, None),
      ("uid1", "1.2.3.4", Some("4"), Some("9371"))))
  }

  test("DM: event-time tumbling window counts with watermark (append)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val facts = in.toDF().toDF("ts", "product")
    val counted = Pipelines.dmWindowCounts(facts, "ts", Seq("product"),
      windowSec = 10, watermark = "5 seconds")
    val q = counted.writeStream.format("memory").queryName("dm_out")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData((t("2024-01-01 00:00:01"), "p1"), (t("2024-01-01 00:00:04"), "p1"))
    q.processAllAvailable()
    // advance watermark past the first window
    in.addData((t("2024-01-01 00:00:30"), "p1"))
    q.processAllAvailable()
    in.addData((t("2024-01-01 00:01:00"), "p2"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("dm_out")
      .select("current_dt", "window_start", "window_end", "product", "cnt")
      .as[(String, String, String, String, Long)].collect().toSet
    assert(rows.contains(
      ("2024-01-01", "2024-01-01 00:00:00", "2024-01-01 00:00:10", "p1", 2L)))
  }

  test("DM window: data older than the watermark is dropped, window finalizes once") {
    // T3/T4 end-to-end: after the watermark passes a window's end, the
    // window is emitted exactly once (append mode) and a straggler
    // older than the watermark must NOT re-open it or change its count.
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val counted = Pipelines.dmWindowCounts(in.toDF().toDF("ts", "product"),
      "ts", Seq("product"), windowSec = 10, watermark = "5 seconds")
    val q = counted.writeStream.format("memory").queryName("dm_late_out")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData((t("2024-01-01 00:00:01"), "p1"), (t("2024-01-01 00:00:04"), "p1"))
    q.processAllAvailable()
    // watermark -> 00:00:25: window [00:00:00, 00:00:10) finalizes (cnt 2)
    in.addData((t("2024-01-01 00:00:30"), "p1"))
    q.processAllAvailable()
    // straggler at 00:00:02 is OLDER than the watermark -> dropped
    in.addData((t("2024-01-01 00:00:02"), "p1"))
    q.processAllAvailable()
    // push the watermark far enough to close every open window
    in.addData((t("2024-01-01 00:01:00"), "p2"))
    q.processAllAvailable(); q.stop()
    val first = spark.table("dm_late_out")
      .filter(col("window_start") === "2024-01-01 00:00:00" && col("product") === "p1")
      .select("cnt").as[Long].collect()
    assert(first.toSeq == Seq(2L),
      s"window must emit once with the pre-watermark count, got $first")
  }

  test("streaming dedup drops repeats within the watermark") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = Pipelines.streamingDedup(
      in.toDF().toDF("ts", "doc_key"), "ts", Seq("doc_key"), "1 minute")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData((t("2024-01-01 00:00:01"), "k1"), (t("2024-01-01 00:00:01"), "k1"),
      (t("2024-01-01 00:00:02"), "k2"))
    q.processAllAvailable()
    // duplicate key across batches, re-arriving with a DIFFERENT
    // timestamp — key-level dedup must still drop it
    in.addData((t("2024-01-01 00:00:09"), "k1"))
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").count() == 2)
  }

  test("stream-stream join correlates events within the time bound") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    val buys = MemoryStream[(java.sql.Timestamp, Long)]
    val joined = Pipelines.streamStreamJoin(
      clicks.toDF().toDF("click_ts", "user_id"), "click_ts",
      buys.toDF().toDF("buy_ts", "user_id"), "buy_ts",
      key = "user_id", watermark = "1 minute", maxDelay = "30 SECONDS")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    clicks.addData((t("2024-01-01 00:00:00"), 1L), (t("2024-01-01 00:00:00"), 2L))
    buys.addData((t("2024-01-01 00:00:10"), 1L),   // within 30s -> joins
      (t("2024-01-01 00:05:00"), 2L))              // too late -> no join
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssj_out").select("user_id").as[Long].collect()
    assert(rows.toSeq == Seq(1L))
  }

  test("streaming sessionization via flatMapGroupsWithState") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val sessions = Sessionize.sessions(spark, in.toDS(), gapSec = 100L)
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("update").start()
    in.addData((7L, 1000L), (7L, 1050L))
    q.processAllAvailable()
    in.addData((7L, 5000L)) // gap > 100 -> new session
    q.processAllAvailable(); q.stop()
    val last = spark.table("sess_out")
      .groupBy("user_id", "session_id").agg(max("n_events").as("n"))
      .orderBy("session_id")
      .as[(Long, Long, Long)].collect()
    assert(last.toSeq == Seq((7L, 1L, 2L), (7L, 2L, 1L)))
  }

  test("built-in session_window groups events by inactivity gap") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val sessions = in.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window(col("ts"), "30 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = sessions.writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    in.addData((t("2024-01-01 00:00:00"), 1L), (t("2024-01-01 00:00:10"), 1L),
      (t("2024-01-01 00:05:00"), 1L)) // gap > 30s -> second session
    in.addData((t("2024-01-01 00:10:00"), 9L)) // advance watermark to close sessions
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sw_out").selectExpr("user_id", "n")
      .as[(Long, Long)].collect().sorted
    assert(rows.toSeq == Seq((1L, 1L), (1L, 2L)))
  }

  test("incremental dedup flags new docs against the accumulated corpus") {
    implicit val sc = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight again"
    val near = base.replace("tonight", "tomorrow")
    val far = "catalyst turns logical plans into physical plans with pushdown pruning and codegen"
    val w = tmp()
    val in = MemoryStream[(Long, String)]
    val q = IncrementalDedup.run(spark, in.toDF().toDF("doc_id", "text"),
      s"$w/store", s"$w/pairs", s"$w/cp", estThreshold = 0.4)
    in.addData((1L, base), (2L, far))          // corpus seed batch
    q.processAllAvailable()
    in.addData((3L, near), (4L, near))         // batch 2: near-dup of 1 + intra pair
    q.processAllAvailable(); q.stop()
    val pairs = spark.read.parquet(s"$w/pairs")
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 1L)) || pairs.contains((4L, 1L))) // cross-batch hit
    assert(pairs.contains((3L, 4L)))                             // intra-batch hit
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))         // unrelated doc clean
    // store accumulated both batches' bands
    assert(spark.read.parquet(s"$w/store").select("id").distinct().count() == 4)
  }

  test("incremental chunk dedup flags cross-batch duplicate chunks " +
    "(C4-at-ingest)") {
    implicit val sc = spark.sqlContext
    // 64-char chunks; doc 1 and doc 3 share their SECOND chunk exactly
    // (different first chunks), doc 2 shares nothing
    val shared = "shared boilerplate licence text that repeats verbatim in docs!!!"
    assert(shared.length == 64)
    def pad(s: String) = (s + " filler words to round out the chunk body")
      .padTo(64, 'x').take(64)
    val w = tmp()
    val in = MemoryStream[(Long, String)]
    val q = IncrementalDedup.runChunks(spark, in.toDF().toDF("doc_id", "text"),
      s"$w/store", s"$w/pairs", s"$w/cp", size = 64, step = 64,
      numHashes = 32, bands = 8)
    in.addData(
      (1L, pad("alpha document opening") + shared),
      (2L, pad("unrelated clean document") + pad("equally clean second chunk")))
    q.processAllAvailable()
    in.addData((3L, pad("gamma document different opening") + shared))
    q.processAllAvailable(); q.stop()
    val pairs = spark.read.parquet(s"$w/pairs")
      .select("new_id", "corpus_id", "est_jaccard")
      .as[(String, String, Double)].collect()
    // the duplicated chunk is flagged ACROSS batches at chunk grain,
    // with full-signature agreement (exact dup → est_jaccard 1.0)
    assert(pairs.exists(p => p._1 == "3#1" && p._2 == "1#1" && p._3 == 1.0),
      s"expected cross-batch chunk pair (3#1, 1#1), got ${pairs.toSeq}")
    // no chunk of the clean doc is flagged, nor the distinct openings
    assert(!pairs.exists(p => p._1.startsWith("2#") || p._2.startsWith("2#")))
    assert(!pairs.exists(p => p._1 == "3#0" || p._2 == "3#0"))
    // the store accumulated every chunk of both batches
    assert(spark.read.parquet(s"$w/store")
      .select("id").distinct().count() == 6)
  }

  test("chunk ingest composed with the publisher: each flush is an " +
    "atomic verified generation; the delta touches only new shards") {
    implicit val sc = spark.sqlContext
    import graft.sinks.Sinks
    val shared = "shared boilerplate licence text that repeats verbatim in docs!!!"
    def pad(s: String) = (s + " filler words to round out the chunk body")
      .padTo(64, 'x').take(64)
    val w = tmp()
    val in = MemoryStream[(Long, String)]
    val q = IncrementalDedup.runChunksPublishing(spark,
      in.toDF().toDF("doc_id", "text"), w, s"$w/cp",
      size = 64, step = 64, numHashes = 32, bands = 8,
      publishEvery = 1, nShards = 8)
    in.addData(
      (1L, pad("alpha document opening") + shared),
      (2L, pad("unrelated clean document") + pad("equally clean second chunk")))
    q.processAllAvailable()
    // first flush: a live, verifiable generation of batch-1 chunks
    val m1 = spark.read.parquet(s"$w/pub/manifest").localCheckpoint()
    assert(Sinks.verifyShards(spark, s"$w/pub", "chunk_id")
      .filter(!col("ok")).count() == 0, "flush 1 must verify clean")
    assert(m1.agg(sum("n_rows")).head.getLong(0) == 4) // 2 docs x 2 chunks
    in.addData((3L, pad("gamma document different opening") + shared))
    q.processAllAvailable(); q.stop()
    val m2 = spark.read.parquet(s"$w/pub/manifest").localCheckpoint()
    assert(Sinks.verifyShards(spark, s"$w/pub", "chunk_id")
      .filter(!col("ok")).count() == 0, "flush 2 must verify clean")
    // the duplicated chunk (3#1 == 1#1) was dropped: only 3#0 arrives
    val published = spark.read.parquet(s"$w/pub/data")
      .select("chunk_id").as[String].collect().toSet
    assert(published.contains("3#0") && !published.contains("3#1"),
      s"expected 3#0 kept and 3#1 deduped, got $published")
    assert(published.contains("1#1"), "the canonical first occurrence survives")
    assert(published.size == 5)
    // the second flush changed ONLY the shards the new chunk hashes
    // into; every other shard carried forward
    val changed = Sinks.diffManifests(m1, m2)
      .filter(col("status") =!= "same")
      .select("shard", "status").as[(Long, String)].collect().toMap
    val newShard = spark.range(1)
      .select(pmod(xxhash64(lit("3#0")), lit(8L))).head.getLong(0)
    assert(changed.keySet == Set(newShard),
      s"expected only shard $newShard to change, got $changed")
  }

  test("incremental span dedup flags a copied span against the corpus store") {
    implicit val sc = spark.sqlContext
    val span = (1 to 20).map(i => s"copied$i").mkString(" ")
    val w = tmp()
    val in = MemoryStream[(Long, String)]
    val q = IncrementalDedup.runSpans(spark, in.toDF().toDF("doc_id", "text"),
      s"$w/store", s"$w/pairs", s"$w/cp")
    in.addData(
      (1L, s"alpha beta gamma delta $span epsilon zeta"),
      (2L, "totally different words with no overlap at all in this document here today"))
    q.processAllAvailable()
    in.addData(
      (3L, s"one two three four five six seven $span eight nine"),
      (4L, "another clean document about completely unrelated topics and nothing else whatsoever"))
    q.processAllAvailable(); q.stop()
    val pairs = spark.read.parquet(s"$w/pairs")
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 1L)))                              // cross-batch span hit
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))          // clean docs stay clean
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(spark.read.parquet(s"$w/store").select("id").distinct().count() == 4)
  }

  test("incremental span store guard: a boilerplate fp accumulated in the " +
    "store cannot fan a later batch out") {
    val boiler = (1 to 20).map(i => s"tmpl$i").mkString(" ")
    val copied = (1 to 20).map(i => s"span$i").mkString(" ")
    val w = tmp()
    // corpus batch: 25 template docs + one real doc carrying `copied`
    val corpus = ((1 to 25).map(i =>
        (i.toLong, s"u${i}a u${i}b u${i}c u${i}d $boiler u${i}e")) :+
      ((100L, s"alpha beta gamma delta $copied epsilon")))
      .toDF("doc_id", "text")
    IncrementalDedup.processSpanBatch(spark, corpus, s"$w/store",
      s"$w/pairs", "text", "doc_id", k = 8, w = 4, minShared = 3L,
      maxPostings = 10)
    // intra guard: the 25·24/2 template pairs never materialize
    assert(spark.read.parquet(s"$w/pairs").count() == 0)
    // probe batch: doc 101 repeats the template AND the copied span —
    // only the true copy may pair (the template fps hold 25 store
    // postings > 10 and are dropped from the cross probe)
    val probe = Seq(
      (101L, s"one two three four five $copied six $boiler seven"))
      .toDF("doc_id", "text")
    IncrementalDedup.processSpanBatch(spark, probe, s"$w/store",
      s"$w/pairs", "text", "doc_id", k = 8, w = 4, minShared = 3L,
      maxPostings = 10)
    val pairs = spark.read.parquet(s"$w/pairs")
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((101L, 100L)), s"got $pairs")
  }

  test("incremental minhash store guard: hot store buckets are excluded, " +
    "true dups still pair") {
    val boiler = (1 to 30).map(i => s"same$i").mkString(" ")
    val unique = (1 to 30).map(i => s"uniq$i").mkString(" ")
    val w = tmp()
    // corpus: 30 IDENTICAL boilerplate docs (they share every band
    // bucket) + one distinct doc
    val corpus = ((1 to 30).map(i => (i.toLong, boiler)) :+ ((100L, unique)))
      .toDF("doc_id", "text")
    IncrementalDedup.processBatch(spark, corpus, s"$w/store", s"$w/pairs",
      "text", "doc_id", numHashes = 32, bands = 8, estThreshold = 0.9,
      maxBucket = 10)
    assert(spark.read.parquet(s"$w/pairs").count() == 0,
      "intra guard must drop the 30-doc boilerplate buckets")
    // probe: one more boilerplate copy (its buckets hold 30 store rows
    // > 10 → dropped) and one copy of the distinct doc (bucket size 1
    // → pairs)
    val probe = Seq((200L, boiler), (201L, unique)).toDF("doc_id", "text")
    IncrementalDedup.processBatch(spark, probe, s"$w/store", s"$w/pairs",
      "text", "doc_id", numHashes = 32, bands = 8, estThreshold = 0.9,
      maxBucket = 10)
    val pairs = spark.read.parquet(s"$w/pairs")
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((201L, 100L)), s"got $pairs")
  }

  test("span dedup n_shared is immune to at-least-once store replay") {
    // foreachBatch may replay a batch, appending its (fp, id) postings
    // to the append-only store TWICE; a later batch's shared-fp tally
    // against those docs must still count distinct fingerprints, not
    // posting rows (2 shared fps must not read as 4).
    val span = (1 to 20).map(i => s"copied$i").mkString(" ")
    val corpus = Seq((1L, s"alpha beta gamma delta $span epsilon zeta"))
      .toDF("doc_id", "text")
    val probe = Seq((9L, s"one two three four five six seven $span eight nine"))
      .toDF("doc_id", "text")
    def nShared(dir: String, replays: Int): Seq[(Long, Long, Long)] = {
      (1 to replays).foreach { _ =>
        IncrementalDedup.processSpanBatch(spark, corpus, s"$dir/store",
          s"$dir/pairs", "text", "doc_id", k = 8, w = 4, minShared = 3L)
      }
      IncrementalDedup.processSpanBatch(spark, probe, s"$dir/store",
        s"$dir/pairs", "text", "doc_id", k = 8, w = 4, minShared = 3L)
      spark.read.parquet(s"$dir/pairs")
        .filter(col("new_id") === 9L)
        .select("new_id", "corpus_id", "n_shared")
        .as[(Long, Long, Long)].collect().toSeq.sorted
    }
    val once = nShared(tmp(), replays = 1)
    val replayed = nShared(tmp(), replays = 2)
    assert(once.nonEmpty, "fixture must share >= minShared fingerprints")
    assert(replayed == once,
      s"replayed store inflated n_shared: $replayed vs $once")
  }

  test("incremental embedding dedup flags near-identical vectors across batches") {
    implicit val sc = spark.sqlContext
    val base = Array.tabulate(16)(i => (i + 1).toFloat / 4f)
    def near(eps: Float) = base.zipWithIndex.map { case (x, i) =>
      x + (if (i % 2 == 0) eps else -eps) }
    val far = Array.tabulate(16)(i => ((i % 3) - 1).toFloat * 2f)
    val w = tmp()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = IncrementalDedup.runEmbeddings(spark,
      in.toDF().toDF("vec_id", "embedding"),
      s"$w/store", s"$w/pairs", s"$w/cp", threshold = 0.99)
    in.addData((1L, base.toSeq), (2L, far.toSeq))   // corpus seed
    q.processAllAvailable()
    in.addData((3L, near(0.01f).toSeq), (4L, near(0.02f).toSeq)) // near-dups of 1 (+ of each other)
    q.processAllAvailable(); q.stop()
    val pairs = spark.read.parquet(s"$w/pairs")
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 1L)) || pairs.contains((4L, 1L)))  // cross-batch hit
    assert(pairs.contains((3L, 4L)))                              // intra-batch hit
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))          // far vector clean
    assert(spark.read.parquet(s"$w/store").select("id").distinct().count() == 4)
  }

  test("incremental dedup pairs are identical across mid-stream store compaction") {
    implicit val sc = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight again"
    val far = "catalyst turns logical plans into physical plans with pushdown pruning and codegen"
    def variant(i: Int) = base.replace("tonight", s"night$i")
    def parquetFiles(dir: String): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(dir)).map(_.getPath)
        .filter(_.endsWith(".parquet"))
    }
    def drive(compactEvery: Int): (Set[(Long, Long)], Int, Seq[String]) = {
      val w = tmp()
      val in = MemoryStream[(Long, String)]
      val q = IncrementalDedup.run(spark, in.toDF().toDF("doc_id", "text"),
        s"$w/store", s"$w/pairs", s"$w/cp", estThreshold = 0.4,
        compactEvery = compactEvery)
      in.addData((1L, base), (2L, far)); q.processAllAvailable()
      in.addData((3L, variant(3))); q.processAllAvailable() // batchId 1: compact fires at every=2
      in.addData((4L, variant(4))); q.processAllAvailable() // probes the COMPACTED store
      in.addData((5L, variant(5))); q.processAllAvailable() // batchId 3: compact again
      q.stop()
      val pairs = spark.read.parquet(s"$w/pairs")
        .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
      (pairs, parquetFiles(s"$w/store").size, parquetFiles(s"$w/store"))
    }
    val (plain, plainFiles, _) = drive(compactEvery = 0)
    val (compacted, compactedFiles, storePaths) = drive(compactEvery = 2)
    assert(plain.nonEmpty && plain.contains((4L, 1L)),
      "fixture must produce cross-batch pairs")
    assert(compacted == plain,
      s"compaction changed pair results: ${compacted.diff(plain)} / ${plain.diff(compacted)}")
    // the compacted store holds fewer, larger generations...
    assert(compactedFiles < plainFiles, s"$compactedFiles !< $plainFiles")
    // ...and snapshots were expired right after each swap
    assert(!storePaths.exists(_.contains("_snap_")), storePaths.mkString(","))
  }

  test("streaming decontamination flags contaminated docs statelessly") {
    import graft.operators.Decontaminate
    implicit val sc = spark.sqlContext
    val bench = Seq((100L, "the secret benchmark answer key sequence here today"))
      .toDF("doc_id", "text")
    val (bits, k) = Decontaminate.bloomBits(bench, "text")
    val in = MemoryStream[(Long, String)]
    val flagged = Decontaminate.flagContaminated(
      in.toDF().toDF("doc_id", "text"), "text", bits, k)
    // stateless projection: must start with no state store requirement
    val q = flagged.writeStream.format("memory").queryName("decontam_out")
      .outputMode("append").start()
    in.addData(
      (1L, "a clean document about completely different things entirely now"),
      (2L, "copied the secret benchmark answer key sequence into training data"),
      (3L, null))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("decontam_out")
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(rows(2L), "doc sharing bench 3-grams must flag")
    assert(!rows(1L), "clean doc must pass")
    // null text = no shingles = CLEAN false, never a three-valued NULL
    // (a downstream filter(!contaminated) must keep it, matching the
    // batch form's zero hits)
    assert(rows.contains(3L) && !rows(3L), "null text must flag clean, not NULL")
  }

  test("streaming chunking + split assignment are stateless ingest projections") {
    // chunk + assignSplit are pure row-local projections (explode +
    // hash coin), so they must run in a stream with no state store,
    // no watermark — ingest-time dataloader prep — and agree exactly
    // with their batch forms on the same rows
    import graft.operators.{Chunking, Sampling}
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val prepped = Sampling.assignSplit(
      Chunking.chunk(in.toDF().toDF("doc_id", "text"), "text",
        size = 8, step = 6, keepCols = Seq("doc_id")),
      "doc_id", Seq("train" -> 0.9, "val" -> 0.1))
    val q = prepped.writeStream.format("memory").queryName("prep_out")
      .outputMode("append").start()
    val docs = Seq((1L, "abcdefghijklmnop"), (2L, "short"), (3L, ""))
    in.addData(docs: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("prep_out")
      .select("doc_id", "chunk_idx", "chunk_text", "split")
      .as[(Long, Long, String, String)].collect().toSet
    val batch = Sampling.assignSplit(
      Chunking.chunk(docs.toDF("doc_id", "text"), "text",
        size = 8, step = 6, keepCols = Seq("doc_id")),
      "doc_id", Seq("train" -> 0.9, "val" -> 0.1))
      .select("doc_id", "chunk_idx", "chunk_text", "split")
      .as[(Long, Long, String, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed.exists(_._1 == 1L) && !streamed.exists(_._1 == 3L))
  }

  test("R2 dual sink writes both targets from one stream") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Int]
    val dirA = tmp() + "/a"; val dirB = tmp() + "/b"
    val q = Sinks.dualSink(in.toDF().toDF("v"), tmp() + "/cp",
      b => b.write.mode("append").parquet(dirA),
      b => b.write.mode("append").parquet(dirB),
      triggerMs = 100L)
    in.addData(1, 2, 3)
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(dirA).count() == 3)
    assert(spark.read.parquet(dirB).count() == 3)
  }

  test("K3 dynamic-topic frame: per-record topic column + JSON value") {
    val df = Seq(("t-a", "x", 1), ("t-b", "y", 2)).toDF("kafka_dwd_topic", "k", "v")
    val frame = Sinks.kafkaDynamicTopicFrame(df, "kafka_dwd_topic").orderBy("topic")
    val rows = frame.as[(String, String)].collect()
    assert(rows.toSeq == Seq(
      ("t-a", """{"k":"x","v":1}"""), ("t-b", """{"k":"y","v":2}""")))
  }

  test("K1 streaming parquet append with date partitioning") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val dir = tmp() + "/ods"
    val q = Sinks.streamAppend(in.toDF().toDF("dt", "payload"), dir,
      tmp() + "/cp2", partitionCols = Seq("dt"), triggerMs = 100L)
    in.addData(("2024-01-01", "a"), ("2024-01-02", "b"))
    q.processAllAvailable(); q.stop()
    val back = spark.read.parquet(dir)
    assert(back.count() == 2)
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("dt=")))
  }

  test("T1: restart from checkpoint resumes exactly-once (no loss, no replay)") {
    // file source + parquet sink + shared checkpoint across two query
    // incarnations — the recovery semantics the reference's 5 s Flink
    // checkpoint provides (SURVEY §2.9 T1). MemoryStream cannot test
    // this: its offsets do not survive a restart.
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val work = tmp()
    val in = s"$work/in"
    new java.io.File(in).mkdirs()
    val schema = new StructType().add("id", LongType).add("v", StringType)
    def writeInput(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$in/$name"),
        rows.map { case (i, v) => s"""{"id":$i,"v":"$v"}""" }.mkString("\n"))
    def runOnce(): Unit = {
      val q = graft.sources.Sources.jsonFileStream(spark, in, schema)
        .writeStream.format("parquet")
        .option("path", s"$work/out")
        .option("checkpointLocation", s"$work/cp")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeInput("a.json", Seq((1L, "x"), (2L, "y")))
    runOnce() // first incarnation processes batch a
    writeInput("b.json", Seq((3L, "z")))
    runOnce() // second incarnation must pick up ONLY batch b
    val ids = spark.read.parquet(s"$work/out")
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L)) // nothing lost, nothing replayed
  }

  test("sessionize state survives a checkpoint restart (same gapSec)") {
    // An open session spanning two query incarnations must keep its id
    // and count — i.e. the keyed state is restored, not rebuilt. Same
    // gapSec on both runs: changing it across a restart is the
    // documented NEW-QUERY case (Sessionize scaladoc rule 1).
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val work = tmp()
    val in = s"$work/in"
    new java.io.File(in).mkdirs()
    val schema = new StructType().add("user_id", LongType).add("sec", LongType)
    def writeInput(name: String, rows: Seq[(Long, Long)]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$in/$name"),
        rows.map { case (u, s) => s"""{"user_id":$u,"sec":$s}""" }.mkString("\n"))
    def runOnce(): Unit = {
      val events = graft.sources.Sources.jsonFileStream(spark, in, schema)
        .as[(Long, Long)]
      val q = Sessionize.sessions(spark, events, gapSec = 100L)
        .writeStream.outputMode("update")
        .option("checkpointLocation", s"$work/cp")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.model.SessionOut], _: Long) =>
          b.write.mode("append").parquet(s"$work/out")
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeInput("a.json", Seq((7L, 1000L), (7L, 1050L)))
    runOnce() // incarnation 1: open session (id 1, 2 events, last=1050)
    // within gap of the RESTORED last-seen (1080-1050 <= 100) -> must
    // extend session 1; then a far event opens session 2
    writeInput("b.json", Seq((7L, 1080L), (7L, 5000L)))
    runOnce() // incarnation 2 resumes from checkpointed state
    val bynSession = spark.read.parquet(s"$work/out")
      .groupBy("user_id", "session_id")
      .agg(max("n_events").as("n"), max("end_sec").as("last"))
      .orderBy("session_id")
      .select("session_id", "n", "last").as[(Long, Long, Long)].collect()
    assert(bynSession.toSeq == Seq((1L, 3L, 1080L), (2L, 1L, 5000L)))
  }

  test("streaming distribution monitor: per-window KLL sketches emit " +
       "append-mode and answer quantiles downstream") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Long)]
    val monitored = graft.operators.Drift.streamingQuantiles(
      in.toDF().toDF("ts", "len"), "ts", "len",
      windowLen = "10 seconds", watermark = "5 seconds")
    val q = monitored.writeStream.format("memory").queryName("kll_mon")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // window 1: lengths 1..100; window 2 opens later with 1001..1100
    in.addData((1L to 100L).map(i => (t("2024-01-01 00:00:01"), i)): _*)
    q.processAllAvailable()
    in.addData((1001L to 1100L).map(i => (t("2024-01-01 00:00:12"), i)): _*)
    q.processAllAvailable()
    // advance the watermark past both windows so append emits them
    in.addData((t("2024-01-01 00:01:00"), 5L))
    q.processAllAvailable(); q.stop()
    val rows = spark.sql(
      """SELECT win_start, n, kll_quantile(sketch, 0.5) AS p50,
        |       kll_rank(sketch, 50.0) AS r50
        |FROM kll_mon ORDER BY win_start""".stripMargin)
      .as[(java.sql.Timestamp, Long, Double, Double)].collect()
    assert(rows.length == 2, s"two closed windows expected, got ${rows.toSeq}")
    val (w1, w2) = (rows(0), rows(1))
    assert(w1._2 == 100L && math.abs(w1._3 - 50.0) <= 5.0,
      s"window-1 median ${w1._3} should sit near 50")
    assert(math.abs(w1._4 - 0.5) <= 0.05,
      s"window-1 rank(50) ${w1._4} should sit near 0.5")
    assert(w2._2 == 100L && math.abs(w2._3 - 1050.0) <= 5.0,
      s"window-2 median ${w2._3} should sit near 1050 — " +
        "distribution drift visible window-over-window")
  }
}
