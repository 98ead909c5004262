package graft.sinks

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Manifest HLL sketches (`zhll_*`) and the metadata-only distinct
  * door: estimate accuracy, rewrite consistency across generations,
  * time travel, and the strict legacy-carry refusal. */
class SketchStatsSpec extends SparkTestBase {
  import spark.implicits._

  // 600 rows, 200 distinct users (u0..u199), skewed repeats
  private def corpus = spark.range(600).toDF("id")
    .withColumn("user", concat(lit("u"), pmod(col("id"), lit(200))))
    .withColumn("payload", concat(lit("b"), col("id")))
    .localCheckpoint()

  test("approxDistinctShards estimates within 5% from the manifest " +
       "alone") {
    val t = Files.createTempDirectory("graft_hll_").toString + "/pub"
    Sinks.writeShards(corpus, t, "id", nShards = 8,
      sketchCols = Seq("user"))
    val m = spark.read.parquet(s"$t/manifest")
    assert(m.columns.contains("zhll_user"))
    val r = Sinks.approxDistinctShards(spark, t, "user").collect().head
    val est = r.getLong(0)
    assert(r.getLong(1) == 8 && r.getLong(2) == 600)
    assert(math.abs(est - 200.0) / 200.0 <= 0.05,
      s"estimate $est vs exact 200 outside 5%")
  }

  test("delta publish recomputes sketches for rewritten shards — the " +
       "door stays answerable and accurate across generations") {
    val t = Files.createTempDirectory("graft_hll_").toString + "/pub"
    Sinks.writeShards(corpus, t, "id", nShards = 8,
      sketchCols = Seq("user"), retainPrevious = true)
    // second generation: new user range doubles the distinct count
    val v2 = corpus.withColumn("user",
      concat(lit("u"), pmod(col("id"), lit(400))))
    Sinks.publishDelta(v2, t, "id", nShards = 8, retainPrevious = true)
    val r = Sinks.approxDistinctShards(spark, t, "user").collect().head
    assert(math.abs(r.getLong(0) - 400.0) / 400.0 <= 0.05,
      s"post-delta estimate ${r.getLong(0)} vs exact 400 outside 5%")
    // time travel: the retained generation still answers the OLD count
    val stamp = Sinks.listShardVersions(spark, t).last
    val old = Sinks.approxDistinctShards(spark, t, "user", Some(stamp))
      .collect().head
    assert(math.abs(old.getLong(0) - 200.0) / 200.0 <= 0.05,
      s"time-travel estimate ${old.getLong(0)} vs exact 200 outside 5%")
  }

  test("null column values are excluded (COUNT(DISTINCT) semantics); " +
       "an all-null shard publishes an EMPTY sketch, not a null one") {
    val t = Files.createTempDirectory("graft_hll_").toString + "/pub"
    // shard 1's user column is entirely null — the publish must still
    // record a (empty) sketch there, or the strict door would refuse
    // a perfectly healthy layout
    val df = spark.range(100).toDF("id")
      .withColumn("user",
        when(col("id") < 50, concat(lit("u"), col("id"))))
      .withColumn("bucket", (col("id") / 50).cast("long"))
    Sinks.writeShards(df, t, "id", nShards = 2,
      shardCol = Some("bucket"), sketchCols = Seq("user"))
    val m = spark.read.parquet(s"$t/manifest")
    assert(m.filter(col("zhll_user").isNull).isEmpty,
      "no shard may publish a null sketch")
    val r = Sinks.approxDistinctShards(spark, t, "user").collect().head
    assert(r.getLong(0) == 50L,
      s"50 non-null users (nulls excluded), estimated ${r.getLong(0)}")
  }

  test("a NULL sketch on a populated shard is refused, never an " +
       "undercount; an undeclared column fails loudly") {
    val t = Files.createTempDirectory("graft_hll_").toString + "/pub"
    Sinks.writeShards(corpus, t, "id", nShards = 4,
      sketchCols = Seq("user"))
    // simulate a legacy carry: null one shard's sketch in the manifest
    val m = spark.read.parquet(s"$t/manifest").localCheckpoint()
    m.withColumn("zhll_user",
        when(col("shard") === 0, lit(null)).otherwise(col("zhll_user")))
      .coalesce(1).write.mode("overwrite").parquet(s"$t/manifest")
    val err = intercept[IllegalStateException] {
      Sinks.approxDistinctShards(spark, t, "user").collect()
    }
    assert(err.getMessage.contains("legacy"))
    val miss = intercept[IllegalArgumentException] {
      Sinks.approxDistinctShards(spark, t, "payload")
    }
    assert(miss.getMessage.contains("sketchCols"))
  }
}
