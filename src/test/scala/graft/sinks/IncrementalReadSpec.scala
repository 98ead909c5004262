package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The manifest-planned consumer doors: [[Sinks.shardStats]] (metadata
  * table) and [[Sinks.readShardsChangedSince]] (incremental read of a
  * delta publish). */
class IncrementalReadSpec extends SparkTestBase {

  private def frame(tag: String, buckets: Int = 4): DataFrame =
    spark.range(200).toDF("id")
      .withColumn("bucket", col("id") % buckets)
      .withColumn("payload", concat(lit(tag), col("id")))

  test("shardStats answers counts and ranges from the manifest alone") {
    val dir = Files.createTempDirectory("graft_stats_").toString
    Sinks.writeShards(frame("a"), s"$dir/pub", "id", nShards = 4,
      zoneCols = Seq("id"), shardCol = Some("bucket"))
    val stats = Sinks.shardStats(spark, s"$dir/pub")
      .select("shard", "n_rows", "min_id", "max_id", "zmin_id", "zmax_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(stats.length == 4)
    stats.foreach { case (shard, n, minId, maxId, zmin, zmax) =>
      assert(n == 50, s"shard $shard rows")
      assert(minId == shard && zmin == shard, s"shard $shard min")
      assert(maxId == 196 + shard && zmax == 196 + shard, s"shard $shard max")
    }
    intercept[java.util.NoSuchElementException] {
      Sinks.shardStats(spark, s"$dir/nowhere")
    }
  }

  test("changed-since returns exactly the restated shard's rows") {
    val dir = Files.createTempDirectory("graft_chg_").toString
    val pub = s"$dir/pub"
    Sinks.writeShards(frame("a"), pub, "id", nShards = 4,
      shardCol = Some("bucket"))
    // restate bucket 2 only; buckets 0/1/3 byte-identical → hard links
    val v2 = frame("a").withColumn("payload",
      when(col("bucket") === 2, concat(lit("B"), col("id")))
        .otherwise(col("payload")))
    Sinks.publishDelta(v2, pub, "id", nShards = 4,
      retainPrevious = true, shardCol = Some("bucket"))
    val stamp = Sinks.listShardVersions(spark, pub).last
    val changed = Sinks.readShardsChangedSince(spark, pub, stamp)
      .select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val expected = (2L until 200L by 4).map(i => (i, s"B$i"))
    assert(changed.toSeq == expected,
      s"changed read must be bucket 2 restated: got ${changed.length} rows")
    // old manifest still describes the retired generation
    val oldStats = Sinks.shardStats(spark, pub, Some(stamp))
    assert(oldStats.count() == 4)
  }

  test("no changes since the retained generation → empty frame") {
    val dir = Files.createTempDirectory("graft_chg0_").toString
    val pub = s"$dir/pub"
    Sinks.writeShards(frame("a"), pub, "id", nShards = 4,
      shardCol = Some("bucket"))
    Sinks.publishDelta(frame("a"), pub, "id", nShards = 4,
      retainPrevious = true, shardCol = Some("bucket"))
    val stamp = Sinks.listShardVersions(spark, pub).last
    assert(Sinks.readShardsChangedSince(spark, pub, stamp).isEmpty,
      "identical republish must deliver nothing to consumers")
  }

  test("delta publish inherits the live zone declarations") {
    val dir = Files.createTempDirectory("graft_chgz_").toString
    val pub = s"$dir/pub"
    Sinks.writeShards(frame("a"), pub, "id", nShards = 4,
      zoneCols = Seq("id"), shardCol = Some("bucket"))
    val v2 = frame("a").withColumn("payload",
      when(col("bucket") === 1, concat(lit("B"), col("id")))
        .otherwise(col("payload")))
    // no zoneCols declared: the layout's zone set carries — rewritten
    // shard 1 gets fresh zmin_id/zmax_id, carried shards keep theirs
    Sinks.publishDelta(v2, pub, "id", nShards = 4, shardCol = Some("bucket"))
    val stats = Sinks.shardStats(spark, pub)
      .select("shard", "zmin_id", "zmax_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(stats.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    stats.foreach { case (s, lo, hi) =>
      assert(lo == s && hi == 196 + s, s"shard $s zone range ($lo,$hi)") }
    // a DIFFERENT zone declaration is rejected loudly
    val e = intercept[IllegalArgumentException] {
      Sinks.publishDelta(v2, pub, "id", nShards = 4,
        zoneCols = Seq("payload"), shardCol = Some("bucket"))
    }
    assert(e.getMessage.contains("full writeShards republish"), e.getMessage)
  }

  test("sortCols: row-group pruning composes with shard skipping") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // tiny row groups so a shard FILE holds many of them — the
    // granularity the sort is supposed to make prunable
    hc.set("parquet.block.size", "16384")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = Files.createTempDirectory("graft_sorted_shards_").toString
      // ts is a PERMUTATION of id (7919 coprime to 20000): any
      // id-ordered physical layout scatters ts across the whole
      // domain, so the control's row groups straddle everything and
      // only the declared sort can restore ts-clustering (an orderBy
      // upstream would not do: writeShards' own repartition destroys
      // it and EliminateSorts removes it)
      val df = spark.range(20000).toDF("id")
        .withColumn("bucket", col("id") % 2)
        .withColumn("ts", (col("id") * 7919) % 20000)
        .withColumn("pad", concat(lit("x" * 40), col("id")))
      Sinks.writeShards(df, s"$dir/sorted", "id", nShards = 2,
        zoneCols = Seq("ts"), shardCol = Some("bucket"),
        sortCols = Seq("ts"))
      Sinks.writeShards(df, s"$dir/plain", "id", nShards = 2,
        zoneCols = Seq("ts"), shardCol = Some("bucket"))
      def decoded(path: String): (Long, Long) = {
        val q = spark.read.parquet(s"$path/data")
          .filter(col("ts") >= 10000 && col("ts") <= 10200)
        // execute THIS plan (count() would build its own) — the scan
        // metric then reports rows decoded post row-group pruning
        val n = q.collect().length.toLong
        val scan = q.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s }.head
        (n, scan.metrics("numOutputRows").value)
      }
      val (nS, decS) = decoded(s"$dir/sorted")
      val (nP, decP) = decoded(s"$dir/plain")
      assert(nS == 201 && nP == 201, s"both layouts answer the query: $nS/$nP")
      // both prune the odd-ts... both buckets hold the range (even ids
      // bucket 0, odd bucket 1) — the win here is WITHIN the files:
      // sorted row groups straddle the range tightly, unsorted decode all
      assert(decS < decP / 4,
        s"sorted shards should decode far fewer rows: $decS vs $decP")
      // the sort is recorded and a plain delta inherits it
      assert(Sinks.shardStats(spark, s"$dir/sorted")
        .select("spec_sort").head().getString(0) == "ts")
      Sinks.publishDelta(df.withColumn("pad",
          when(col("bucket") === 1, concat(lit("y" * 40), col("id")))
            .otherwise(col("pad"))),
        s"$dir/sorted", "id", nShards = 2, shardCol = Some("bucket"))
      assert(Sinks.shardStats(spark, s"$dir/sorted")
        .select("spec_sort").distinct().head().getString(0) == "ts")
      val e = intercept[IllegalArgumentException] {
        Sinks.publishDelta(df, s"$dir/sorted", "id", nShards = 2,
          shardCol = Some("bucket"), sortCols = Seq("id"))
      }
      assert(e.getMessage.contains("full writeShards republish"), e.getMessage)
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("an empty first generation does not lose the sort declaration") {
    val dir = Files.createTempDirectory("graft_emptysort_").toString
    val pub = s"$dir/pub"
    val full = spark.range(100).toDF("id")
      .withColumn("bucket", col("id") % 2)
      .withColumn("ts", col("id"))
    // publish an EMPTY corpus with a declared sort (zero manifest
    // rows), then delta-publish data with the SAME declaration: the
    // empty generation declares nothing, so this must be accepted —
    // not rejected as a redeclaration
    Sinks.writeShards(full.filter(lit(false)), pub, "id", nShards = 2,
      zoneCols = Seq("ts"), shardCol = Some("bucket"), sortCols = Seq("ts"))
    Sinks.publishDelta(full, pub, "id", nShards = 2,
      shardCol = Some("bucket"), sortCols = Seq("ts"))
    assert(Sinks.shardStats(spark, pub)
      .select("spec_sort").distinct().head().getString(0) == "ts")
  }

  test("expireShardVersions: retired generations age out, live reads hold") {
    val dir = Files.createTempDirectory("graft_expire_").toString
    val pub = s"$dir/pub"
    Sinks.writeShards(frame("a"), pub, "id", nShards = 4,
      shardCol = Some("bucket"))
    Sinks.publishDelta(frame("b"), pub, "id", nShards = 4,
      retainPrevious = true, shardCol = Some("bucket"))
    Sinks.publishDelta(frame("c"), pub, "id", nShards = 4,
      retainPrevious = true, shardCol = Some("bucket"))
    val stamps = Sinks.listShardVersions(spark, pub)
    assert(stamps.size == 2)
    // epoch cutoff removes nothing; "now" removes both
    assert(Sinks.expireShardVersions(spark, pub, 0L) == 0)
    assert(Sinks.expireShardVersions(spark, pub,
      System.currentTimeMillis() + 1000) == 2)
    assert(Sinks.listShardVersions(spark, pub).isEmpty)
    // the live generation still serves — hard-linked files survive the
    // retired dirs' deletion by their own link counts
    assert(spark.read.parquet(s"$pub/data").count() == 200L)
    intercept[java.util.NoSuchElementException] {
      Sinks.readShardsAt(spark, pub, stamps.last).collect()
    }
  }

  test("a shard that did not exist at the stamp is delivered as changed") {
    val dir = Files.createTempDirectory("graft_chgnew_").toString
    val pub = s"$dir/pub"
    // generation 1: buckets 0..2 only
    val g1 = frame("a").filter(col("bucket") < 3)
    Sinks.writeShards(g1, pub, "id", nShards = 4, shardCol = Some("bucket"))
    Sinks.publishDelta(frame("a"), pub, "id", nShards = 4,
      retainPrevious = true, shardCol = Some("bucket"))
    val stamp = Sinks.listShardVersions(spark, pub).last
    val got = Sinks.readShardsChangedSince(spark, pub, stamp)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (3L until 200L by 4).toSeq,
      "the new bucket-3 shard must be delivered")
  }
}
