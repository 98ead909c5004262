package graft.plans

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.expressions.BloomOps
import graft.sinks.Sinks

/** Driver-memory bounds on the planner's manifest cache: at 100 TB a
  * layout has ~10^5 shards and the manifest's BLOB stats (bloom
  * bitsets, HLL/KLL sketch payloads) outweigh the scalar zones by
  * orders of magnitude. The cache must hold scalars only, load blob
  * columns lazily per probe, and evict per-entry — never wholesale.
  * This spec builds a 100k-shard manifest DIRECTLY (no data files:
  * the cache never touches them) and pins bytes + decisions. */
class ShardLayoutsCacheSpec extends SparkTestBase {

  /** A 100k-shard manifest with one long zone column, a 1024-bit
    * bloom per shard (containing exactly "v<shard>") and a 200-byte
    * fake sketch blob — the blob families that must NOT be cached. */
  private lazy val bigLayout: String = {
    val dir = Files.createTempDirectory("graft_slc_").toString
    val n = 100000
    val m = spark.range(n).toDF("shard")
      .withColumn("item", concat(lit("v"), col("shard")))
      .groupBy(col("shard"))
      .agg(BloomOps.bloomAgg(col("item"), 1024, 4).as("zbloom_v"))
      .withColumn("n_rows", lit(1L))
      .withColumn("zmin_v", col("shard"))
      .withColumn("zmax_v", col("shard"))
      .withColumn("znull_v", lit(0L))
      .withColumn("zbloomk_v", lit(4))
      .withColumn("zbloomt_v", lit("bigint"))
      .withColumn("zkll_v", lit(Array.fill(200)(7.toByte)))
    m.repartition(4).write.parquet(s"$dir/pub/manifest")
    s"$dir/pub"
  }

  test("100k-shard manifest caches scalar stats only, bounded bytes") {
    ShardLayouts.clearCaches()
    val mf = ShardLayouts.manifestFor(spark,
      new Path(s"$bigLayout/data")).get
    assert(mf.rows.length == 100000)
    // blob columns are projected OUT of the cached rows; their
    // existence is still discoverable through the full schema
    val cachedNames = mf.attrs.map(_.name).toSet
    assert(!cachedNames.exists(n => n.startsWith("zbloom_") ||
      n.startsWith("zkll_") || n.startsWith("zhll_")),
      s"blob columns cached: $cachedNames")
    assert(cachedNames.contains("zbloomk_v") &&
      cachedNames.contains("zbloomt_v") && cachedNames.contains("zmin_v"))
    assert(mf.bloomCols == Set("v") && mf.zoneCols == Set("v"))
    assert(mf.fullSchema.fieldNames.contains("zbloom_v") &&
      mf.fullSchema.fieldNames.contains("zkll_v"))
    // 100k light rows are ~15 MB; WITH the blobs they would be 35+ MB
    assert(mf.sizeBytes > 0 && mf.sizeBytes < (30L << 20),
      s"cached manifest holds ${mf.sizeBytes} bytes")
    val (entries, bytes) = ShardLayouts.manifestCacheStats
    assert(entries >= 1 && bytes >= mf.sizeBytes)
  }

  test("bloom bitsets load lazily per column with unchanged decisions") {
    val mf = ShardLayouts.manifestFor(spark,
      new Path(s"$bigLayout/data")).get
    val bc = ShardLayouts.bloomFor(spark, mf, "v").get
    assert(bc.byShard.size == 100000)
    // decision parity: the probe for "v123" must keep shard 123
    // (one-sided: never a false negative) and prune almost all others
    val kept = bc.byShard.count { case (_, sb) =>
      BloomOps.containsMaybe(sb.bits, sb.k, "v123")
    }
    assert(BloomOps.containsMaybe(bc.byShard(123L).bits,
      bc.byShard(123L).k, "v123"))
    assert(kept < 2000, s"1024-bit/1-item blooms kept $kept of 100k")
    // second ask is served from the bloom cache (same token)
    val again = ShardLayouts.bloomFor(spark, mf, "v").get
    assert(again.token == bc.token)
    val (entries, bytes) = ShardLayouts.bloomCacheStats
    assert(entries == 1 && bytes == bc.sizeBytes)
    // an undeclared column refuses rather than guessing
    assert(ShardLayouts.bloomFor(spark, mf, "nope").isEmpty)
  }

  test("manifest cache evicts per-entry LRU under a byte budget") {
    val dir = Files.createTempDirectory("graft_slc_lru_").toString
    def publish(name: String): Path = {
      val df = spark.range(40).toDF("id")
        .withColumn("v", col("id") % 4)
      Sinks.writeShards(df, s"$dir/$name", "id", nShards = 2,
        zoneCols = Seq("v"))
      new Path(s"$dir/$name/data")
    }
    val (a, b, c) = (publish("a"), publish("b"), publish("c"))
    ShardLayouts.clearCaches()
    val sizeA = ShardLayouts.manifestFor(spark, a).get.sizeBytes
    // budget fits two entries, not three
    spark.conf.set("spark.graft.manifestCache.maxBytes",
      (sizeA * 5 / 2).toString)
    try {
      ShardLayouts.clearCaches()
      ShardLayouts.manifestFor(spark, a)
      ShardLayouts.manifestFor(spark, b)
      assert(ShardLayouts.manifestCacheStats._1 == 2)
      ShardLayouts.manifestFor(spark, c)
      // per-entry eviction: ONE evicted (the LRU 'a'), not a clear-all
      val (entries, bytes) = ShardLayouts.manifestCacheStats
      assert(entries == 2, s"expected 2 cached entries, got $entries")
      assert(bytes <= sizeA * 5 / 2)
      // the evicted layout still answers (reloaded transparently)
      assert(ShardLayouts.manifestFor(spark, a).get.rows.length == 2)
    } finally {
      spark.conf.unset("spark.graft.manifestCache.maxBytes")
      ShardLayouts.clearCaches()
    }
  }

  test("automatic bloom pruning decisions survive the lazy-load split") {
    val dir = Files.createTempDirectory("graft_slc_auto_").toString
    val df = spark.range(400).toDF("id")
      .withColumn("key", concat(lit("k"), col("id")))
      .withColumn("v", col("id") % 7)
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 8,
      zoneCols = Seq("v"), bloomCols = Seq("key"))
    val read = spark.read.parquet(s"$dir/pub/data")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = read.filter(col("key") === "k123")
      val out = q.collect()
      assert(out.length == 1 && out.head.getAs[Long]("id") == 123L)
      val files = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.headOption.getOrElse(0L)
      assert(files < 8, s"bloom probe should prune files, opened $files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
