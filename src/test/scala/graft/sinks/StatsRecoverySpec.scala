package graft.sinks

import java.nio.file.Files

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The stats-recovery doors: [[Sinks.rebuildManifest]] (reconstruct a
  * lost/corrupt manifest from nothing but the data files, spec
  * verified against the bytes) and [[Sinks.declareShardStats]] (add
  * stat families / heal legacy carries without rewriting a data
  * byte). Covers reconstruction fidelity, spec-mismatch refusal,
  * zero-data-write evolution, healing the strict doors back to life,
  * no-op detection, and the promote crash envelope. */
class StatsRecoverySpec extends SparkTestBase {
  import spark.implicits._

  private val fs = org.apache.hadoop.fs.FileSystem.getLocal(
    spark.sparkContext.hadoopConfiguration)

  private def clone(src: String, dst: String): Unit =
    FileUtil.copy(fs, new Path(src), fs, new Path(dst), false,
      spark.sparkContext.hadoopConfiguration)

  private def corpus = spark.range(0, 200).toDF("id")
    .withColumn("bucket", col("id") % 4)
    .withColumn("score", (col("id") * 7 % 101).cast("long"))
    .withColumn("tag", concat(lit("t"), col("id") % 13))
    .withColumn("payload", concat(lit("p"), col("id")))

  /** Per-shard deterministic manifest columns as a sorted map for
    * exact comparison (blob stats — bloom/hll/kll — compared
    * semantically elsewhere; their bytes may differ by merge order). */
  private def deterministic(path: String): Map[Long, Seq[Any]] = {
    val m = spark.read.parquet(s"$path/manifest")
    m.select(col("shard"), col("n_rows"), col("min_id"), col("max_id"),
        col("content_hash"), col("zmin_score"), col("zmax_score"),
        col("znull_score"), col("zsum_score"), col("zmin_tag"),
        col("zmax_tag"), col("znull_tag"), col("spec_col"), col("spec_n"),
        col("spec_sort"), col("spec_id"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
  }

  test("rebuildManifest reconstructs a DELETED manifest bit-compatibly " +
    "on every deterministic stat, and the blob doors answer again") {
    val work = Files.createTempDirectory("graft_rbm_").toString
    val t = s"$work/corpus"
    Sinks.writeShards(corpus, t, "id", nShards = 4,
      shardCol = Some("bucket"),
      zoneCols = Seq("score", "tag"), bloomCols = Seq("tag"),
      sketchCols = Seq("tag"), quantileCols = Seq("score"),
      sortCols = Seq("score"))
    val before = deterministic(t)
    val distinctBefore = Sinks.approxDistinctShards(spark, t, "tag")
      .collect().head.getLong(0)
    val pointBefore = Sinks.readShardsPoint(spark, t, "tag", "t5")
      .select("id").collect().map(_.getLong(0)).sorted

    // the disaster: the manifest is gone
    fs.delete(new Path(s"$t/manifest"), true)
    intercept[Exception] { Sinks.shardStats(spark, t).collect() }

    Sinks.rebuildManifest(spark, t, "id", nShards = 4,
      shardCol = Some("bucket"),
      zoneCols = Seq("score", "tag"), bloomCols = Seq("tag"),
      sketchCols = Seq("tag"), quantileCols = Seq("score"),
      sortCols = Seq("score"))
    assert(deterministic(t) == before,
      "every deterministic per-shard stat must reconstruct exactly")
    val distinctAfter = Sinks.approxDistinctShards(spark, t, "tag")
      .collect().head.getLong(0)
    assert(distinctAfter == distinctBefore,
      s"HLL distinct: $distinctAfter vs $distinctBefore pre-disaster")
    val pointAfter = Sinks.readShardsPoint(spark, t, "tag", "t5")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(pointAfter.toSeq == pointBefore.toSeq,
      "bloom point reads must return identical rows post-rebuild")
    val p50 = Sinks.approxQuantilesShards(spark, t, "score", Seq(0.5))
      .collect().head.getDouble(1)
    assert(p50 > 30 && p50 < 70, s"rebuilt KLL median off: $p50")
  }

  test("rebuildManifest REFUSES a spec that does not reproduce the " +
    "published shard directories") {
    val work = Files.createTempDirectory("graft_rbm2_").toString
    // hash layout: 8 shards
    val t = s"$work/hash"
    Sinks.writeShards(corpus, t, "id", nShards = 8)
    fs.delete(new Path(s"$t/manifest"), true)
    val eN = intercept[IllegalArgumentException] {
      Sinks.rebuildManifest(spark, t, "id", nShards = 7)
    }
    assert(eN.getMessage.contains("does not reproduce"))
    val eId = intercept[IllegalArgumentException] {
      Sinks.rebuildManifest(spark, t, "payload", nShards = 8)
    }
    assert(eId.getMessage.contains("does not reproduce"))
    // the right spec still lands after the refusals (no debris)
    Sinks.rebuildManifest(spark, t, "id", nShards = 8)
    assert(Sinks.shardStats(spark, t).agg(sum("n_rows"))
      .collect().head.getLong(0) == 200L)
    // explicit layout: wrong shardCol refused
    val t2 = s"$work/expl"
    Sinks.writeShards(corpus, t2, "id", nShards = 4,
      shardCol = Some("bucket"))
    fs.delete(new Path(s"$t2/manifest"), true)
    val eSc = intercept[IllegalArgumentException] {
      Sinks.rebuildManifest(spark, t2, "id", nShards = 4,
        shardCol = Some("score"))
    }
    assert(eSc.getMessage.contains("does not reproduce"))
  }

  test("declareShardStats ADDS stat families with ZERO data writes " +
    "(files hard-link forward) and retains the displaced generation") {
    val work = Files.createTempDirectory("graft_dss_").toString
    val t = s"$work/corpus"
    Sinks.writeShards(corpus, t, "id", nShards = 4,
      shardCol = Some("bucket"), zoneCols = Seq("score"))
    def dataFiles: Map[String, Long] = {
      val it = fs.listFiles(new Path(s"$t/data"), true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) { val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          b += (s"${f.getPath.getParent.getName}/${f.getPath.getName}"
            -> f.getLen) }
      b.result()
    }
    val filesBefore = dataFiles
    // the strict doors refuse before the declaration
    intercept[Exception] {
      Sinks.approxDistinctShards(spark, t, "tag").collect() }
    intercept[Exception] {
      Sinks.approxQuantilesShards(spark, t, "score", Seq(0.5)).collect() }

    Sinks.declareShardStats(spark, t,
      zoneCols = Seq("tag"), bloomCols = Seq("tag"),
      sketchCols = Seq("tag"), quantileCols = Seq("score"),
      retainPrevious = true)
    assert(dataFiles == filesBefore,
      "stat evolution must not rewrite, rename, or resize a data file")
    assert(Sinks.listShardVersions(spark, t).size == 1,
      "the displaced (stats-poor) generation must be retained")
    // every door now answers
    val d = Sinks.approxDistinctShards(spark, t, "tag")
      .collect().head.getLong(0)
    assert(d == 13L, s"13 distinct tags, HLL said $d")
    val pt = Sinks.readShardsPoint(spark, t, "tag", "t3")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(pt.toSeq == (0L until 200L).filter(_ % 13 == 3),
      "bloom point read after declaration")
    val m = Sinks.shardStats(spark, t)
    assert(m.columns.contains("zmin_tag") &&
      m.filter(col("zmin_tag").isNull).count() == 0)
    // zones declared at publish survive the evolution untouched
    assert(m.filter(col("zmin_score").isNull).count() == 0)
  }

  test("declareShardStats HEALS legacy carries (scan pruned to the " +
    "carrying shards) and is a NO-OP when nothing is missing") {
    val work = Files.createTempDirectory("graft_heal_").toString
    val t = s"$work/corpus"
    Sinks.writeShards(corpus, t, "id", nShards = 4,
      shardCol = Some("bucket"), zoneCols = Seq("score"),
      sketchCols = Seq("tag"))
    // forge a legacy carry: null shard 2's tag sketch in the manifest
    val mrows = spark.read.parquet(s"$t/manifest")
    val forged = mrows.withColumn("zhll_tag",
      when(col("shard") === 2L, lit(null)
        .cast(mrows.schema("zhll_tag").dataType))
        .otherwise(col("zhll_tag")))
    val tmp = s"$work/forged_manifest"
    forged.coalesce(1).write.parquet(tmp)
    fs.delete(new Path(s"$t/manifest"), true)
    assert(fs.rename(new Path(tmp), new Path(s"$t/manifest")))
    assert(Sinks.shardDoctor(spark, t)
      .select("legacy_carry_shards").collect().head.getLong(0) == 1L)
    intercept[IllegalStateException] {
      Sinks.approxDistinctShards(spark, t, "tag").collect() }

    // heal: no new declarations, just refill the nulls
    Sinks.declareShardStats(spark, t)
    assert(Sinks.shardDoctor(spark, t)
      .select("legacy_carry_shards").collect().head.getLong(0) == 0L)
    val d = Sinks.approxDistinctShards(spark, t, "tag")
      .collect().head.getLong(0)
    assert(d == 13L, s"healed HLL distinct: $d")
    // healthy shards carried forward exactly (content hash compare)
    val hashes = Sinks.shardStats(spark, t)
      .select("shard", "content_hash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.size == 4)

    // second call: nothing missing, nothing new -> NO new generation
    val versionsBefore = Sinks.listShardVersions(spark, t).size
    Sinks.declareShardStats(spark, t, sketchCols = Seq("tag"),
      zoneCols = Seq("score"), retainPrevious = true)
    assert(Sinks.listShardVersions(spark, t).size == versionsBefore,
      "an idempotent declaration must not publish a generation")
  }

  test("a kill at ANY mid-promote point of a stats publish recovers " +
    "to the complete OLD or complete NEW manifest, data never mixed") {
    val work = Files.createTempDirectory("graft_killp_").toString
    val v1 = s"$work/v1"
    Sinks.writeShards(corpus, v1, "id", nShards = 4,
      shardCol = Some("bucket"), zoneCols = Seq("score"))
    // build v2 (the stats-evolved generation) by the real door on a clone
    val vc = s"$work/vc"
    clone(v1, vc)
    Sinks.declareShardStats(spark, vc, sketchCols = Seq("tag"))
    for (steps <- 0 to 4) {
      val t = s"$work/kill$steps/pub"
      clone(v1, t)
      val base = new Path(t)
      val staging = new Path(base, "_staging_01000000000000000001")
      val old = new Path(base, "_old_01000000000000000001")
      fs.mkdirs(staging); fs.mkdirs(old)
      clone(s"$vc/data", s"$t/_staging_01000000000000000001/data")
      clone(s"$vc/manifest", s"$t/_staging_01000000000000000001/manifest")
      fs.create(new Path(staging, Sinks.PublishCommitMarker), true).close()
      val ops: Seq[() => Unit] = Seq(
        () => fs.rename(new Path(base, "data"), new Path(old, "data")),
        () => fs.rename(new Path(staging, "data"), new Path(base, "data")),
        () => fs.rename(new Path(base, "manifest"),
          new Path(old, "manifest")),
        () => fs.rename(new Path(staging, "manifest"),
          new Path(base, "manifest")))
      ops.take(steps).foreach(_())
      // the kill; the next writer's entry sweep converges the layout
      Sinks.recoverPublish(fs, base)
      // sealed staging -> roll forward: the new manifest must be live
      val m = Sinks.shardStats(spark, t)
      assert(m.columns.contains("zhll_tag"),
        s"kill after $steps renames: sealed staging must roll FORWARD")
      assert(m.agg(sum("n_rows")).collect().head.getLong(0) == 200L,
        s"kill after $steps renames: corpus incomplete after recovery")
      assert(Sinks.approxDistinctShards(spark, t, "tag")
        .collect().head.getLong(0) == 13L,
        s"kill after $steps renames: the declared door must answer")
    }
  }

  test("concurrent-reader pin: a reader holding the displaced stamp " +
    "keeps a CONSISTENT pre-evolution corpus after declareShardStats") {
    val work = Files.createTempDirectory("graft_ccr_").toString
    val t = s"$work/corpus"
    Sinks.writeShards(corpus, t, "id", nShards = 4,
      shardCol = Some("bucket"), zoneCols = Seq("score"))
    val before = spark.read.parquet(s"$t/data")
      .select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    Sinks.declareShardStats(spark, t, sketchCols = Seq("tag"),
      retainPrevious = true)
    val stamp = Sinks.listShardVersions(spark, t).head
    // the displaced generation: identical rows, pre-evolution manifest
    val old = Sinks.readShardsAt(spark, t, stamp)
      .select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(old == before, "the retained generation must be the exact " +
      "pre-evolution corpus (hard links, not copies or mixes)")
    assert(!Sinks.shardStats(spark, t, Some(stamp)).columns
        .contains("zhll_tag"),
      "the retained manifest must be the PRE-declaration one")
    assert(Sinks.shardStats(spark, t).columns.contains("zhll_tag"),
      "the live manifest must carry the new declaration")
  }

  test("SQL procedure forms: rebuild_manifest and declare_shard_stats") {
    val work = Files.createTempDirectory("graft_sqlrm_").toString
    val t = s"$work/corpus"
    Sinks.writeShards(corpus, t, "id", nShards = 4,
      shardCol = Some("bucket"), zoneCols = Seq("score"))
    fs.delete(new Path(s"$t/manifest"), true)
    val rebuilt = spark.sql(
      s"SELECT shard, n_rows FROM rebuild_manifest('$t', 'id', 4, " +
        "'bucket', 'score,tag') ORDER BY shard")
    assert(rebuilt.collect().map(_.getLong(1)).sum == 200L)
    val declared = spark.sql(
      s"SELECT count(*) FROM declare_shard_stats('$t', '', '', 'tag', '')")
    assert(declared.collect().head.getLong(0) == 4L)
    assert(spark.sql(
        s"SELECT approx_distinct FROM approx_distinct_shards('$t', 'tag')")
      .collect().head.getLong(0) == 13L)
  }

  test("healing CONVERGES when a live stat family's base column " +
    "vanished from the data: the family drops, healed shards do not " +
    "re-flag, and the second call is a no-op") {
    // the displaced-rebin-spec-column case: live manifest carries
    // zone stats on 'score', but the data generation no longer has a
    // 'score' column. Pre-fix, the healing union resurrected the
    // vanished family as NULLs on healed shards, which re-flagged as
    // legacy carries on every later call — healing never converged.
    val work = Files.createTempDirectory("graft_heal_").toString
    val t = s"$work/corpus"
    Sinks.writeShards(corpus, t, "id", nShards = 4,
      zoneCols = Seq("score"), sketchCols = Seq("tag"))
    // 1) the data loses 'score' (rewrite the generation without it)
    val tmpData = s"$work/data_tmp"
    spark.read.parquet(s"$t/data").drop("score")
      .write.mode("overwrite").partitionBy("shard").parquet(tmpData)
    fs.delete(new Path(s"$t/data"), true)
    assert(fs.rename(new Path(tmpData), new Path(s"$t/data")))
    // 2) shard 0 becomes a legacy carry on the LIVE family (zhll_tag)
    val m = spark.read.parquet(s"$t/manifest")
    val tagType = m.schema("zhll_tag").dataType
    val tmpMan = s"$work/man_tmp"
    m.withColumn("zhll_tag", when(col("shard") === 0L,
        lit(null).cast(tagType)).otherwise(col("zhll_tag")))
      .write.mode("overwrite").parquet(tmpMan)
    fs.delete(new Path(s"$t/manifest"), true)
    assert(fs.rename(new Path(tmpMan), new Path(s"$t/manifest")))
    // 3) heal (no new declarations)
    val healed = Sinks.declareShardStats(spark, t)
    assert(!healed.columns.exists(_.endsWith("_score")),
      s"vanished family must DROP, got ${healed.columns.mkString(",")}")
    assert(healed.filter(col("zhll_tag").isNull).count() == 0,
      "the legacy carry must heal")
    // 4) convergence: the next call finds nothing to do — no publish
    val before = fs.listStatus(new Path(s"$t/manifest"))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap
    Sinks.declareShardStats(spark, t)
    val after = fs.listStatus(new Path(s"$t/manifest"))
      .map(s => s.getPath.getName -> s.getModificationTime).toMap
    assert(after == before,
      "a healed layout must be a NO-OP on the next healing call")
    // and the sketch door still answers on the healed manifest
    assert(Sinks.approxDistinctShards(spark, t, "tag")
      .collect().head.getLong(0) == 13L)
  }

  test("SQL rebuild_manifest accepts shard_col '' (hash-of-id layout) " +
    "in both the 4- and 5-arg forms") {
    // pre-fix, litString rejected '' so a hash-sharded layout could
    // not be rebuilt from SQL at all (round-14 advice)
    val work = Files.createTempDirectory("graft_sqlrmh_").toString
    val t = s"$work/corpus"
    Sinks.writeShards(corpus, t, "id", nShards = 4) // hash-of-id
    fs.delete(new Path(s"$t/manifest"), true)
    val rebuilt4 = spark.sql(
      s"SELECT shard, n_rows FROM rebuild_manifest('$t', 'id', 4, '')")
    assert(rebuilt4.collect().map(_.getLong(1)).sum == 200L)
    // manifest lives again; delete and rebuild with zone stats too
    fs.delete(new Path(s"$t/manifest"), true)
    val rebuilt5 = spark.sql(
      s"SELECT shard, n_rows FROM rebuild_manifest('$t', 'id', 4, '', " +
        "'score')")
    assert(rebuilt5.collect().map(_.getLong(1)).sum == 200L)
    assert(spark.read.parquet(s"$t/manifest").columns
      .contains("zmin_score"))
  }
}
