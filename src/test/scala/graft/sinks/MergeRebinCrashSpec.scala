package graft.sinks

import java.nio.file.Files

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Crash/concurrency envelope for the round-13 write doors:
  * `mergeRows`-with-moves (the atomic delete+upsert of one id across
  * shards) walked through every mid-promote kill point, and
  * `rebinShardsByQuantiles`' cut-table staleness made LOUD — a
  * re-rebin crashing between its layout commit and its cuts overwrite
  * must be detected by [[Sinks.qbinCuts]]' manifest check, never
  * silently mis-bin later patches. Plus the concurrent-reader pin:
  * a reader holding the displaced generation keeps a consistent
  * corpus across both doors. */
class MergeRebinCrashSpec extends SparkTestBase {
  import spark.implicits._

  private val fs = org.apache.hadoop.fs.FileSystem.getLocal(
    spark.sparkContext.hadoopConfiguration)

  private def clone(src: String, dst: String): Unit =
    FileUtil.copy(fs, new Path(src), fs, new Path(dst), false,
      spark.sparkContext.hadoopConfiguration)

  private def corpus = spark.range(0, 100).toDF("id")
    .withColumn("bucket", col("id") % 4)
    .withColumn("payload", concat(lit("p"), col("id")))

  test("mergeRows MOVE survives every mid-promote kill point: the " +
    "moved id is never stranded deleted-but-not-reinserted") {
    // v1: id=5 lives at its explicit shard (bucket 1). v2: ONE merge
    // generation deletes it there and upserts it at bucket 3 with new
    // payload — the atomic-move shape. A kill after any prefix of the
    // promote's renames must recover to FULL v1 or FULL v2: exactly
    // one row for id=5, at one of the two shards, with the matching
    // payload — the crash window the single-generation design closes.
    val work = Files.createTempDirectory("graft_mvk_").toString
    val v1 = s"$work/v1"
    Sinks.writeShards(corpus.withColumn("bucket",
        when(col("id") === 5L, lit(1L)).otherwise(col("id") % 4)),
      v1, "id", nShards = 4, shardCol = Some("bucket"))
    // build v2 by running the REAL door on a clone
    val vc = s"$work/vc"
    clone(v1, vc)
    val patch = Seq(
      (5L, 1L, "p5", 1),        // delete at the OLD shard
      (5L, 3L, "p5-moved", 0))  // upsert at the NEW shard
      .toDF("id", "bucket", "payload", "_del")
    Sinks.mergeRows(spark, vc, patch, "id",
      deleteWhen = Some(col("_del") === 1))
    val v2rows = spark.read.parquet(s"$vc/data")
      .select(col("id"), col("bucket"), col("payload"),
        col("shard").cast("long")).collect()
    assert(v2rows.count(_.getLong(0) == 5L) == 1 &&
      v2rows.find(_.getLong(0) == 5L).get.getLong(3) == 3L,
      "the clone's merge must have moved id 5 to shard 3")

    // the promote's rename sequence, in code order (promoteStaged)
    for (steps <- 0 to 4) {
      val t = s"$work/kill$steps/pub"
      clone(v1, t)
      val base = new Path(t)
      val staging = new Path(base, "_staging_01000000000000000001")
      val old = new Path(base, "_old_01000000000000000001")
      fs.mkdirs(staging); fs.mkdirs(old)
      clone(s"$vc/data", s"$t/_staging_01000000000000000001/data")
      clone(s"$vc/manifest",
        s"$t/_staging_01000000000000000001/manifest")
      fs.create(new Path(staging, Sinks.PublishCommitMarker), true).close()
      val ops: Seq[() => Unit] = Seq(
        () => fs.rename(new Path(base, "data"), new Path(old, "data")),
        () => fs.rename(new Path(staging, "data"), new Path(base, "data")),
        () => fs.rename(new Path(base, "manifest"),
          new Path(old, "manifest")),
        () => fs.rename(new Path(staging, "manifest"),
          new Path(base, "manifest")))
      ops.take(steps).foreach(_.apply())
      Sinks.recoverPublish(fs, base)
      val label = s"kill after step $steps"
      assert(Sinks.verifyShards(spark, t, "id")
        .filter(!col("ok")).isEmpty, s"$label: must verify clean")
      val got = spark.read.parquet(s"$t/data")
        .filter(col("id") === 5L)
        .select(col("shard").cast("long"), col("payload"))
        .as[(Long, String)].collect()
      assert(got.length == 1,
        s"$label: id 5 must exist exactly once, got ${got.toSeq}")
      assert(got.head == ((1L, "p5")) || got.head == ((3L, "p5-moved")),
        s"$label: id 5 must be fully pre- or post-move, got ${got.head}")
      assert(spark.read.parquet(s"$t/data").count() == 100L,
        s"$label: row count drifted")
    }
  }

  test("a reader holding the displaced generation stays consistent " +
    "across a merge-move (retainPrevious time travel)") {
    val t = Files.createTempDirectory("graft_mvr_").toString + "/pub"
    Sinks.writeShards(corpus, t, "id", nShards = 4,
      shardCol = Some("bucket"))
    val patch = Seq((5L, 1L, "p5", 1), (5L, 3L, "p5-moved", 0))
      .toDF("id", "bucket", "payload", "_del")
    Sinks.mergeRows(spark, t, patch, "id",
      deleteWhen = Some(col("_del") === 1), retainPrevious = true)
    val stamp = Sinks.listShardVersions(spark, t).last
    val before = Sinks.readShardsAt(spark, t, stamp)
      .filter(col("id") === 5L).select("payload").as[String].collect()
    assert(before.toSeq == Seq("p5"),
      "the displaced generation must still serve the pre-move row")
    val after = spark.read.parquet(s"$t/data")
      .filter(col("id") === 5L).select("payload").as[String].collect()
    assert(after.toSeq == Seq("p5-moved"))
  }

  /** Scattered lengths, then a skew injection that shifts every
    * quantile — so a re-rebin's cuts genuinely move. */
  private def lenCorpus = spark.range(0, 3000).toDF("id")
    .withColumn("len", (col("id") * 7919L) % 10000L)
    .withColumn("payload", concat(lit("p"), col("id")))

  test("a re-rebin crash between layout commit and cuts overwrite is " +
    "DETECTED: qbinCuts refuses the stale cut table loudly") {
    val t = Files.createTempDirectory("graft_rbk_").toString + "/pub"
    Sinks.writeShards(lenCorpus.localCheckpoint(), t, "id", nShards = 8,
      zoneCols = Seq("len"), quantileCols = Seq("len"))
    Sinks.rebinShardsByQuantiles(spark, t, "id", "len", nShards = 8)
    // happy path: the published cuts verify against the live manifest
    val (binCol, cuts1) = Sinks.qbinCuts(spark, t)
    assert(binCol == "len" && cuts1.length == 7)
    // inject heavy low-end skew THROUGH the door (binned with the
    // live cuts — consistent), then re-rebin: quantiles shift, so the
    // new cut table differs from the old one
    val skew = spark.range(20000, 24000).toDF("id")
      .withColumn("len", col("id") % 50L)
      .withColumn("payload", concat(lit("s"), col("id")))
      .withColumn("qbin", Sinks.qbinExpr(cuts1, col("len")))
      .localCheckpoint()
    Sinks.mergeRows(spark, t, skew, "id")
    // save the (about to be stale) v1 cuts aside, re-rebin, then
    // simulate the crash: the committed v2 layout beside v1's cuts
    val aside = new Path(t, "_cuts_aside")
    clone(s"$t/qbin_cuts", s"$t/_cuts_aside")
    Sinks.rebinShardsByQuantiles(spark, t, "id", "len", nShards = 8)
    val (_, cuts2) = Sinks.qbinCuts(spark, t)
    assert(cuts2 != cuts1, "skew must move the cuts or the test is vacuous")
    fs.delete(new Path(t, "qbin_cuts"), true)
    fs.rename(aside, new Path(t, "qbin_cuts"))
    val stale = intercept[IllegalStateException](Sinks.qbinCuts(spark, t))
    assert(stale.getMessage.contains("STALE"),
      s"wrong refusal: ${stale.getMessage}")
    // recovery is re-running the rebin; the door then verifies again
    Sinks.rebinShardsByQuantiles(spark, t, "id", "len", nShards = 8)
    val (_, cuts3) = Sinks.qbinCuts(spark, t)
    assert(cuts3.length == 7)
  }

  test("qbinCuts refuses a missing, unstamped, or spec-mismatched " +
    "cut table") {
    val t = Files.createTempDirectory("graft_rbs_").toString + "/pub"
    Sinks.writeShards(lenCorpus.localCheckpoint(), t, "id", nShards = 8,
      zoneCols = Seq("len"), quantileCols = Seq("len"))
    // never rebinned → no cuts
    val none = intercept[IllegalArgumentException](Sinks.qbinCuts(spark, t))
    assert(none.getMessage.contains("not a quantile-rebinned"))
    Sinks.rebinShardsByQuantiles(spark, t, "id", "len", nShards = 8)
    val (_, cuts8) = Sinks.qbinCuts(spark, t)
    // a pre-stamp cut table (cut_idx/cut only) is refused, not guessed
    cuts8.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("cut_idx", "cut").coalesce(1)
      .write.mode("overwrite").parquet(s"$t/qbin_cuts")
    val unstamped = intercept[IllegalArgumentException](
      Sinks.qbinCuts(spark, t))
    assert(unstamped.getMessage.contains("bin_col"))
    // re-rebin at nShards=4, then restore the 8-shard cut table: the
    // spec_n mismatch is caught before any containment math
    Sinks.rebinShardsByQuantiles(spark, t, "id", "len", nShards = 8)
    val saved = new Path(t, "_cuts8")
    clone(s"$t/qbin_cuts", s"$t/_cuts8")
    Sinks.rebinShardsByQuantiles(spark, t, "id", "len", nShards = 4)
    fs.delete(new Path(t, "qbin_cuts"), true)
    fs.rename(saved, new Path(t, "qbin_cuts"))
    val mismatch = intercept[IllegalArgumentException](
      Sinks.qbinCuts(spark, t))
    assert(mismatch.getMessage.contains("does not describe the live layout"))
  }

  test("rebin inherits the live layout's zone declarations (a date " +
    "zone used by range reads must survive a rebin)") {
    val t = Files.createTempDirectory("graft_rbz_").toString + "/pub"
    val df = lenCorpus.withColumn("day", col("id") % 30L)
      .localCheckpoint()
    Sinks.writeShards(df, t, "id", nShards = 8,
      zoneCols = Seq("len", "day"), bloomCols = Seq("payload"),
      sketchCols = Seq("payload"), quantileCols = Seq("len"))
    Sinks.rebinShardsByQuantiles(spark, t, "id", "len", nShards = 8)
    val m = spark.read.parquet(s"$t/manifest")
    for (c <- Seq("zmin_len", "zmin_day", "zbloom_payload",
        "zhll_payload", "zkll_len"))
      assert(m.columns.contains(c),
        s"rebin stripped $c (have: ${m.columns.sorted.mkString(", ")})")
    // the inherited zone still powers pruned range reads
    val pruned = Sinks.readShardsBetween(spark, t, "day", 3L, 3L)
    assert(pruned.count() == df.filter(col("day") === 3L).count())
  }

  test("shard_doctor does not report a healthy all-null zone shard " +
    "as a legacy carry") {
    val t = Files.createTempDirectory("graft_doc0_").toString + "/pub"
    // bucket 0's zone column is entirely null — a CURRENT-generation
    // publish records null zmin/zmax beside znull == n_rows, which is
    // the documented totality stance, not a stale stat
    val df = spark.range(0, 80).toDF("id")
      .withColumn("bucket", col("id") % 4)
      .withColumn("maybe",
        when(col("bucket") === 0L, lit(null).cast("long"))
          .otherwise(col("id")))
    Sinks.writeShards(df, t, "id", nShards = 4,
      shardCol = Some("bucket"), zoneCols = Seq("maybe"))
    val d = spark.sql(s"SELECT * FROM shard_doctor('$t')").collect().head
    assert(d.getAs[Long]("legacy_carry_shards") == 0L,
      "an all-null zone shard is healthy, not a legacy carry")
    // a GENUINE legacy carry (null zone stat without the all-null
    // proof) is still counted: doctor a manifest row by hand
    val m = spark.read.parquet(s"$t/manifest")
    m.withColumn("zmin_maybe",
        when(col("shard") === 1L, lit(null).cast("long"))
          .otherwise(col("zmin_maybe")))
      .withColumn("znull_maybe",
        when(col("shard") === 1L, lit(null).cast("long"))
          .otherwise(col("znull_maybe")))
      .coalesce(1).write.mode("overwrite").parquet(s"$t/manifest2")
    fs.delete(new Path(t, "manifest"), true)
    fs.rename(new Path(t, "manifest2"), new Path(t, "manifest"))
    val d2 = spark.sql(s"SELECT * FROM shard_doctor('$t')").collect().head
    assert(d2.getAs[Long]("legacy_carry_shards") == 1L,
      "a null zone stat with unknown null count IS a legacy carry")
  }
}
