package graft.storage

import graft.SparkTestBase
import graft.expressions.ZOrderKey
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------- kernel

  test("bucket: binary search with ties-right and NaN/-inf to zero") {
    val b = Array(1.0, 2.0, 2.0, 5.0)
    assert(ZOrderKey.bucket(b, 0.5) == 0)
    assert(ZOrderKey.bucket(b, 1.0) == 1)   // tie goes right
    assert(ZOrderKey.bucket(b, 1.5) == 1)
    assert(ZOrderKey.bucket(b, 2.0) == 3)   // right of the EQUAL RUN
    assert(ZOrderKey.bucket(b, 4.9) == 3)
    assert(ZOrderKey.bucket(b, 5.0) == 4)
    assert(ZOrderKey.bucket(b, 99.0) == 4)
    assert(ZOrderKey.bucket(b, Double.NaN) == 0)
    assert(ZOrderKey.bucket(b, Double.NegativeInfinity) == 0)
  }

  test("zkey: MSB-first interleave of two dims") {
    // buckets chosen directly: boundaries 1,2,3 -> buckets 0..3 (2 bits)
    val bnds = Array(Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0))
    // x -> bucket 2 (0b10), y -> bucket 1 (0b01)
    // interleave MSB-first x,y: bits x1 y1 x0 y0 = 1 0 0 1 = 9
    assert(ZOrderKey.zkey(bnds, 2, Array(2.5, 1.5)) == 9L)
    // both max bucket: 0b1111 = 15
    assert(ZOrderKey.zkey(bnds, 2, Array(9.0, 9.0)) == 15L)
    // both zero
    assert(ZOrderKey.zkey(bnds, 2, Array(0.0, 0.0)) == 0L)
  }

  test("zkey expression evaluates under codegen and matches the kernel") {
    val bnds = Seq(Array(25.0, 50.0, 75.0), Array(250.0, 500.0, 750.0))
    val df = spark.range(100).select(
      col("id").cast("double").as("x"),
      (col("id") * 10).cast("double").as("y"))
    val got = df.select(col("x"), col("y"),
        ZOrder.zkeyCol(Seq(col("x"), col("y")), bnds, 2).as("zk"))
      .collect()
    got.foreach { r =>
      val exp = ZOrderKey.zkey(bnds.toArray, 2,
        Array(r.getDouble(0), r.getDouble(1)))
      assert(r.getLong(2) == exp, s"row $r")
    }
  }

  test("null input buckets to zero instead of nulling the key") {
    val df = Seq((Some(10.0), 5.0), (None, 5.0)).toDF("x", "y")
    val bnds = Seq(Array(1.0), Array(1.0))
    val keys = df.select(
      ZOrder.zkeyCol(Seq(col("x"), col("y")), bnds, 1).as("zk"))
      .collect().map(_.getLong(0))
    assert(keys(0) == 3L) // both above the cut: 0b11
    assert(keys(1) == 1L) // null x -> bucket 0: 0b01
  }

  // ---------------------------------------------------- layout + reads

  private def mkCorpus(n: Int) = {
    // two INDEPENDENT skewed dimensions: u ~ quadratic (heavy low end),
    // v ~ uniform but decorrelated from u via a multiplicative hash
    spark.range(n).select(
      col("id").as("row_id"),
      (col("id") * col("id") / n).cast("long").as("u"),
      pmod(col("id") * 2654435761L, lit(n.toLong)).cast("long").as("v"))
  }

  test("z-ordered publish prunes shards on BOTH dimensions") {
    val n = 20000
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString + "/t"
    val df = mkCorpus(n)
    ZOrder.publish(df, dir, "row_id", Seq("u", "v"), nShards = 16,
      bitsPerDim = 8)

    val manifest = spark.read.parquet(s"$dir/manifest")
    assert(manifest.count() == 16)

    // a ~1/8-wide slice of EACH dimension must open well under half
    // the shards (hash sharding would open all 16; perfect 1-D range
    // binning would open all 16 on the OTHER dimension)
    val uMax = df.agg(max("u")).head.getLong(0)
    val uRead = graft.sinks.Sinks.readShardsBetween(
      spark, dir, "u", 0L, uMax / 8)
    val vRead = graft.sinks.Sinks.readShardsBetween(
      spark, dir, "v", 0L, (n / 8).toLong)

    def shardsOpened(dfr: org.apache.spark.sql.DataFrame): Long =
      dfr.select(col("shard")).distinct().count()
    val uShards = shardsOpened(uRead)
    val vShards = shardsOpened(vRead)
    assert(uShards <= 8, s"u-slice opened $uShards/16 shards")
    assert(vShards <= 8, s"v-slice opened $vShards/16 shards")

    // and the answers are exact vs a direct filter
    val uExp = df.filter(col("u") <= uMax / 8).count()
    val vExp = df.filter(col("v") <= n / 8).count()
    assert(uRead.count() == uExp)
    assert(vRead.count() == vExp)
  }

  test("quantile bucketing keeps shards balanced under skew") {
    val n = 20000
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString + "/t"
    ZOrder.publish(mkCorpus(n), dir, "row_id", Seq("u", "v"),
      nShards = 16, bitsPerDim = 8)
    val rows = spark.read.parquet(s"$dir/manifest")
      .select("n_rows").as[Long].collect()
    val (mn, mx) = (rows.min, rows.max)
    assert(mx <= mn * 3 + 64,
      s"shard skew too high under z-binning: min=$mn max=$mx")
  }

  test("recluster re-publishes an existing layout z-ordered") {
    val n = 5000
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString + "/t"
    val df = mkCorpus(n)
    // first publish: plain hash sharding — no clustering
    graft.sinks.Sinks.writeShards(df, dir, "row_id", nShards = 8,
      zoneCols = Seq("u", "v"))
    val before = spark.read.parquet(s"$dir/manifest")
      .filter(col("zmax_u") >= 0 && col("zmin_u") <= n / 8)
      .count()
    assert(before == 8, "hash sharding should not prune")

    ZOrder.recluster(spark, dir, "row_id", Seq("u", "v"), nShards = 8)
    val after = spark.read.parquet(s"$dir/manifest")
    assert(after.count() == 8)
    assert(after.columns.contains("zmin_u") && after.columns.contains("zmin_v"))
    // content survived the rewrite
    val live = spark.read.parquet(s"$dir/data")
    assert(live.count() == n)
    assert(live.select(sum(col("u"))).head.getLong(0) ==
      df.select(sum(col("u"))).head.getLong(0))
    // and now a u-slice prunes
    val uRead = graft.sinks.Sinks.readShardsBetween(
      spark, dir, "u", 0L, df.agg(max("u")).head.getLong(0) / 8)
    assert(uRead.select(col("shard")).distinct().count() <= 4)
  }

  test("single-shard and empty-input degenerate cases") {
    val dir1 = java.nio.file.Files.createTempDirectory("graft_zorder_").toString + "/t"
    ZOrder.publish(mkCorpus(100), dir1, "row_id", Seq("u"), nShards = 1,
      bitsPerDim = 4)
    assert(spark.read.parquet(s"$dir1/data").count() == 100)

    val dir2 = java.nio.file.Files.createTempDirectory("graft_zorder_").toString + "/t"
    ZOrder.publish(mkCorpus(100).filter(lit(false)), dir2, "row_id",
      Seq("u", "v"), nShards = 4)
    assert(spark.read.parquet(s"$dir2/manifest").count() == 0)
  }
}
