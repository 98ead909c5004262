package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sinks.Sinks

/** Shard-pruned top-k: ORDER BY <zone col> LIMIT k over a published
  * layout opens only the shards that can reach the top-k, and the
  * answer is identical to the unpruned sort. */
class TopKShardPruningSpec extends SparkTestBase {

  // 3 shards with disjoint ts ranges: s0 [0,297], s1 [1001,1298],
  // s2 [2002,2299]; 100 rows each (shard k holds ids ≡ k mod 3,
  // ts = k*1000 + id)
  private lazy val pub: String = {
    val dir = Files.createTempDirectory("graft_topk_").toString
    val df = spark.range(300).toDF("id")
      .withColumn("bucket", col("id") % 3)
      .withColumn("ts", (col("bucket") * 1000 + col("id")).cast("long"))
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 3,
      zoneCols = Seq("ts"), shardCol = Some("bucket"))
    s"$dir/pub"
  }

  private def read(): DataFrame = spark.read.parquet(s"$pub/data")

  /** (rows, scanned-partition shard dirs) with AQE off so the logical
    * rewrite is visible in the executed plan. */
  private def run(df: DataFrame): (Seq[org.apache.spark.sql.Row], Seq[String]) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val rows = df.collect().toSeq
      val parts = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.relation.location.listFiles(
          s.partitionFilters, s.dataFilters)
          .map(_.files.head.getPath.getParent.getName).distinct
      }.flatten.distinct.sorted
      (rows, parts)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("ORDER BY ts DESC LIMIT k opens only the newest shard") {
    val (rows, parts) = run(read()
      .orderBy(col("ts").desc, col("id")).limit(5)
      .select("id", "ts"))
    // top 5 by ts desc: ts 2299, 2296, ... (ids 299, 296, ...)
    assert(rows.map(_.getLong(1)) == Seq(2299L, 2296L, 2293L, 2290L, 2287L))
    assert(parts == Seq("shard=2"),
      s"top-k must open only the newest shard, scanned: $parts")
  }

  test("ORDER BY ts ASC LIMIT k opens only the oldest shard") {
    val (rows, parts) = run(read()
      .orderBy(col("ts").asc, col("id")).limit(4).select("ts"))
    assert(rows.map(_.getLong(0)) == Seq(0L, 3L, 6L, 9L))
    assert(parts == Seq("shard=0"),
      s"bottom-k must open only the oldest shard, scanned: $parts")
  }

  test("k spanning two shards keeps exactly those two") {
    val (rows, parts) = run(read()
      .orderBy(col("ts").desc).limit(150).select("ts"))
    assert(rows.length == 150)
    // 100 rows in shard 2, next 50 from shard 1
    assert(rows.map(_.getLong(0)).min == 1151L) // 1298 - 3*49
    assert(parts == Seq("shard=1", "shard=2"),
      s"150 rows need the two newest shards, scanned: $parts")
  }

  test("k larger than the layout keeps every shard, same rows") {
    val (rows, parts) = run(read().orderBy(col("ts")).limit(1000))
    assert(rows.length == 300)
    assert(parts.length == 3)
  }

  test("a non-zone first sort key keeps every shard") {
    val (rows, parts) = run(read()
      .orderBy(col("id").desc).limit(3).select("id"))
    assert(rows.map(_.getLong(0)) == Seq(299L, 298L, 297L))
    assert(parts.length == 3,
      s"id has no zone stats, nothing may be pruned: $parts")
  }

  test("kill switch keeps every shard, same answer") {
    spark.conf.set("spark.graft.topKShardPruning.enabled", "false")
    try {
      val (rows, parts) = run(read()
        .orderBy(col("ts").desc).limit(5).select("ts"))
      assert(rows.map(_.getLong(0)).head == 2299L)
      assert(parts.length == 3, s"disabled rule must scan all: $parts")
    } finally
      spark.conf.set("spark.graft.topKShardPruning.enabled", "true")
  }

  test("nulls-first ascending keeps null-bearing shards") {
    val dir = Files.createTempDirectory("graft_topk_null_").toString
    // shard 0 (even ids): ts = 5000 + id (largest values, no nulls);
    // shard 1 (odd ids): ts null for id < 20, else ts = id
    val df = spark.range(60).toDF("id")
      .withColumn("bucket", col("id") % 2)
      .withColumn("ts",
        when(col("bucket") === 1 && col("id") < 20, lit(null))
          .otherwise(when(col("bucket") === 0, col("id") + 5000)
            .otherwise(col("id"))))
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 2,
      zoneCols = Seq("ts"), shardCol = Some("bucket"))
    // asc default = NULLS FIRST: the 10 nulls (odd ids < 20) lead,
    // then ts 21, 23, ... — shard 1 alone serves k = 12
    val (rows, parts) = run(spark.read.parquet(s"$dir/pub/data")
      .orderBy(col("ts")).limit(12).select("ts"))
    assert(rows.take(10).forall(_.isNullAt(0)))
    assert(rows.drop(10).map(_.getLong(0)) == Seq(21L, 23L))
    assert(parts == Seq("shard=1"),
      s"nulls + smallest values live in shard 1 alone: $parts")
  }

  test("desc nulls-last: trailing nulls never un-prune the top") {
    val dir = Files.createTempDirectory("graft_topk_nl_").toString
    val df = spark.range(60).toDF("id")
      .withColumn("bucket", col("id") % 2)
      .withColumn("ts",
        when(col("bucket") === 1 && col("id") < 20, lit(null))
          .otherwise(when(col("bucket") === 0, col("id") + 5000)
            .otherwise(col("id"))))
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 2,
      zoneCols = Seq("ts"), shardCol = Some("bucket"))
    // desc default = NULLS LAST: top-3 are the largest non-null values,
    // all in shard 0; shard 1's nulls sort last and cannot contribute
    val (rows, parts) = run(spark.read.parquet(s"$dir/pub/data")
      .orderBy(col("ts").desc).limit(3).select("ts"))
    assert(rows.map(_.getLong(0)) == Seq(5058L, 5056L, 5054L))
    assert(parts == Seq("shard=0"),
      s"nulls-last top-k lives in shard 0 alone: $parts")
  }

  test("filtered top-k: θ from full shards prunes what the filter can't") {
    // ts <= 2100 intersects every shard (zone skipping alone prunes
    // nothing): s0/s1 provably FULL, s2 PARTIAL. θ for k=5 comes from
    // s1 (100 guaranteed rows ≥ 1001), which rules out s0 entirely —
    // the top-5 live in s2's passing rows
    val df = read().filter(col("ts") <= 2100)
      .orderBy(col("ts").desc).limit(5).select("ts")
    val (rows, parts) = run(df)
    assert(rows.map(_.getLong(0)) == Seq(2098L, 2095L, 2092L, 2089L, 2086L))
    assert(parts == Seq("shard=1", "shard=2"),
      s"θ must drop shard 0 under the filter, scanned: $parts")
  }

  test("filtered top-k: range filter composes with the newest-shard cut") {
    // ts in [1000, 2100]: s0 disjoint (dropped), s1 FULL, s2 PARTIAL
    val df = read()
      .filter(col("ts") >= 1000 && col("ts") <= 2100)
      .orderBy(col("ts").desc).limit(5).select("ts")
    val (rows, parts) = run(df)
    assert(rows.map(_.getLong(0)) == Seq(2098L, 2095L, 2092L, 2089L, 2086L))
    assert(parts == Seq("shard=1", "shard=2"),
      s"disjoint shard must drop, full+partial stay: $parts")
  }

  test("filtered top-k: an unanalyzable filter disables pruning") {
    val df = read().filter(col("id") > 10)
      .orderBy(col("ts").desc).limit(3).select("ts")
    val (rows, parts) = run(df)
    assert(rows.map(_.getLong(0)) == Seq(2299L, 2296L, 2293L))
    assert(parts.length == 3,
      s"no zone proof for the filter, nothing may be pruned: $parts")
  }

  test("SQL ORDER BY ... LIMIT goes through the same pruning") {
    read().createOrReplaceTempView("topk_layout")
    val df = spark.sql(
      "SELECT ts FROM topk_layout ORDER BY ts DESC LIMIT 5")
    val (rows, parts) = run(df)
    assert(rows.map(_.getLong(0)) == Seq(2299L, 2296L, 2293L, 2290L, 2287L))
    assert(parts == Seq("shard=2"), s"SQL path must prune too: $parts")
  }
}
