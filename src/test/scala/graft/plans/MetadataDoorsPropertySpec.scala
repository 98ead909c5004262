package graft.plans

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sinks.Sinks

/** Property harness for every manifest-stat planner door
  * (ZoneMapSkipping, ManifestAggregates global/filtered/grouped,
  * TopKShardPruning): random filters, aggregates, and top-k shapes
  * over two adversarial layouts must give EXACTLY the door-off answer.
  * The doors' correctness argument is "bail unless provable" — this
  * spec hammers the provable region's edges (nulls in zone columns, an
  * all-null shard, ties at shard boundaries, empty filter results,
  * both sort directions and null orderings) with a fixed seed so
  * failures replay. */
class MetadataDoorsPropertySpec extends SparkTestBase {

  // Layout A: 5 shards on ts with overlapping ranges, nulls in shard 1,
  // an all-null shard 4, and a single-group string col per shard.
  private lazy val pubA: String = {
    val dir = Files.createTempDirectory("graft_prop_a_").toString
    val df = spark.range(200).toDF("id")
      .withColumn("bucket", col("id") % 5)
      .withColumn("ts",
        when(col("bucket") === 4, lit(null))
          .when(col("bucket") === 1 && col("id") % 3 === 1, lit(null))
          .otherwise(col("bucket") * 50 + (col("id") % 70)))
      .withColumn("grp", concat(lit("g"), col("bucket")))
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 5,
      zoneCols = Seq("ts", "grp"), shardCol = Some("bucket"))
    s"$dir/pub"
  }

  // Layout B: disjoint tight ranges (the pruning-friendly shape) with
  // duplicate group values across shards (two shards per group).
  private lazy val pubB: String = {
    val dir = Files.createTempDirectory("graft_prop_b_").toString
    val df = spark.range(240).toDF("id")
      .withColumn("bucket", col("id") % 6)
      .withColumn("ts", col("bucket") * 1000 + col("id"))
      .withColumn("grp", concat(lit("g"), col("bucket") % 3))
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 6,
      zoneCols = Seq("ts", "grp"), shardCol = Some("bucket"))
    s"$dir/pub"
  }

  private val doorKeys = Seq(
    "spark.graft.zoneMapSkipping.enabled",
    "spark.graft.manifestAggregates.enabled",
    "spark.graft.manifestAggregates.filteredCount.enabled",
    "spark.graft.manifestAggregates.grouped.enabled",
    "spark.graft.topKShardPruning.enabled")

  private def doorsOff[T](body: => T): T = {
    doorKeys.foreach(spark.conf.set(_, "false"))
    try body finally doorKeys.foreach(spark.conf.set(_, "true"))
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString).sorted

  private def randFilter(rnd: Random): org.apache.spark.sql.Column = {
    def one(): org.apache.spark.sql.Column = rnd.nextInt(7) match {
      case 0 => col("ts") >= lit(rnd.between(-50L, 6200L))
      case 1 => col("ts") > lit(rnd.between(-50L, 6200L))
      case 2 => col("ts") <= lit(rnd.between(-50L, 6200L))
      case 3 => col("ts") < lit(rnd.between(-50L, 6200L))
      case 4 => col("ts") === lit(rnd.between(0L, 6000L))
      case 5 => col("ts").isNotNull
      case 6 => col("ts").isNull
    }
    if (rnd.nextBoolean()) one() else one() && one()
  }

  test("random filtered aggregates match the door-off answer exactly") {
    val rnd = new Random(20260815L)
    for (pub <- Seq(pubA, pubB); i <- 1 to 12) {
      val f = randFilter(rnd)
      def q() = spark.read.parquet(s"$pub/data").filter(f)
        .agg(count(lit(1)).as("n"), count(col("ts")).as("nt"),
          sum(col("ts")).as("s"), min(col("ts")).as("lo"),
          max(col("ts")).as("hi"), min(col("id")).as("ilo"),
          max(col("id")).as("ihi"))
      val expected = doorsOff(canon(q()))
      assert(canon(q()) == expected,
        s"filtered aggregate diverged (layout=$pub case=$i filter=$f)")
    }
  }

  test("random grouped (and grouped+filtered) match door-off exactly") {
    val rnd = new Random(7_20260815L)
    for (pub <- Seq(pubA, pubB); i <- 1 to 10) {
      val base = spark.read.parquet(s"$pub/data")
      val src = if (rnd.nextBoolean()) base.filter(randFilter(rnd)) else base
      def q() = src.groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(col("ts")).as("s"),
          min(col("ts")).as("lo"), max(col("ts")).as("hi"),
          min(col("id")).as("ilo"), max(col("id")).as("ihi"))
      val expected = doorsOff(canon(q()))
      assert(canon(q()) == expected,
        s"grouped aggregate diverged (layout=$pub case=$i)")
    }
  }

  test("random top-k (filtered and not) matches door-off exactly") {
    val rnd = new Random(13_20260815L)
    for (pub <- Seq(pubA, pubB); i <- 1 to 12) {
      val base = spark.read.parquet(s"$pub/data")
      val src = if (rnd.nextInt(3) == 0) base.filter(randFilter(rnd)) else base
      val k = rnd.between(1, 60)
      val ord = rnd.nextInt(4) match {
        case 0 => col("ts").asc            // NULLS FIRST default
        case 1 => col("ts").desc           // NULLS LAST default
        case 2 => col("ts").asc_nulls_last
        case 3 => col("ts").desc_nulls_first
      }
      // unique tiebreak makes the row SET deterministic, so sorted
      // string compare is exact
      def q() = src.orderBy(ord, col("id")).limit(k).select("id", "ts")
      val expected = doorsOff(canon(q()))
      assert(canon(q()) == expected,
        s"top-k diverged (layout=$pub case=$i k=$k ord=$ord)")
    }
  }

  test("random DISTINCT over the group column matches door-off") {
    for (pub <- Seq(pubA, pubB)) {
      def q() = spark.read.parquet(s"$pub/data").select("grp").distinct()
      assert(canon(q()) == doorsOff(canon(q())), s"distinct diverged: $pub")
    }
  }
}
