package graft.sinks

import graft.SparkTestBase
import graft.expressions.BloomOps
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Per-shard bloom stats (`zbloom_*`) and the point-lookup door — the
  * pruning a hash-sharded corpus can't get from min/max zones, plus
  * the cross-generation consistency contracts (inherited (m, k),
  * legacy-null conservatism). */
class BloomZoneSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int) = spark.range(n).toDF("id")
    .withColumn("key", concat(lit("k"), col("id")))
    .withColumn("payload", concat(lit("body "), col("id")))
    .localCheckpoint()

  test("point lookup opens only bloom-candidate shards and returns " +
       "exactly the matching rows") {
    val t = Files.createTempDirectory("graft_bloom_").toString + "/pub"
    Sinks.writeShards(corpus(400), t, "id", nShards = 8,
      bloomCols = Seq("key"))
    val m = spark.read.parquet(s"$t/manifest")
    assert(m.columns.contains("zbloom_key") &&
      m.columns.contains("zbloomk_key"))
    // the true shard of k137 under hash sharding
    val trueShard = spark.range(1)
      .select(pmod(xxhash64(lit(137L)), lit(8L))).as[Long].collect().head
    val cands = Sinks.bloomCandidateShards(spark, t, "key", "k137")
    assert(cands.contains(trueShard), "one-sided: never drop the true shard")
    assert(cands.size < 8,
      s"bloom should prune most of 8 shards, kept ${cands.size}")
    val got = Sinks.readShardsPoint(spark, t, "key", "k137")
      .select("id", "payload").as[(Long, String)].collect().toSeq
    assert(got == Seq((137L, "body 137")))
    // absent value: typically zero candidates, always zero rows
    assert(Sinks.readShardsPoint(spark, t, "key", "no-such-key").isEmpty)
  }

  test("bloom works on non-string columns through the canonical string " +
       "form (SQL door included)") {
    val t = Files.createTempDirectory("graft_bloom_").toString + "/pub"
    Sinks.writeShards(corpus(200), t, "id", nShards = 4,
      bloomCols = Seq("id"))
    val got = Sinks.readShardsPoint(spark, t, "id", "59")
      .select("key").as[String].collect().toSeq
    assert(got == Seq("k59"))
    val viaSql = spark.sql(
      s"SELECT key FROM shards_point('$t', 'id', '59')")
      .as[String].collect().toSeq
    assert(viaSql == Seq("k59"))
  }

  test("delta publish rebuilds rewritten shards' blooms under the live " +
       "(m, k) and carries the rest — probes stay consistent") {
    val t = Files.createTempDirectory("graft_bloom_").toString + "/pub"
    Sinks.writeShards(corpus(400), t, "id", nShards = 8,
      bloomCols = Seq("key"))
    val before = spark.read.parquet(s"$t/manifest")
      .select(col("shard"), size(col("zbloom_key")).as("words"),
        col("zbloomk_key")).as[(Long, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // v2 changes one doc's payload: its shard rewrites, others carry
    val v2 = corpus(400).withColumn("payload",
      when(col("id") === 7L, lit("revised")).otherwise(col("payload")))
      .localCheckpoint()
    Sinks.publishDelta(v2, t, "id", nShards = 8)
    val after = spark.read.parquet(s"$t/manifest")
      .select(col("shard"), size(col("zbloom_key")).as("words"),
        col("zbloomk_key")).as[(Long, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(after == before, "same (m, k) on every shard across the delta")
    // the rewritten generation still answers point lookups exactly
    assert(Sinks.readShardsPoint(spark, t, "key", "k7")
      .select("payload").as[String].collect().toSeq == Seq("revised"))
  }

  test("deleteWhere keeps bloom stats live: a removed key's shard " +
       "rebuilds, and the lookup finds nothing after the takedown") {
    val t = Files.createTempDirectory("graft_bloom_").toString + "/pub"
    Sinks.writeShards(corpus(200), t, "id", nShards = 4,
      bloomCols = Seq("key"))
    Sinks.deleteWhere(spark, t, "id", col("key") === "k42")
    assert(Sinks.readShardsPoint(spark, t, "key", "k42").isEmpty)
    // un-deleted neighbors still resolve
    assert(Sinks.readShardsPoint(spark, t, "key", "k43")
      .select("id").as[Long].collect().toSeq == Seq(43L))
  }

  test("legacy-null blooms degrade conservatively: unknown shards stay " +
       "candidates, lookups stay exact") {
    val t = Files.createTempDirectory("graft_bloom_").toString + "/pub"
    // a layout WITHOUT blooms...
    Sinks.writeShards(corpus(100), t, "id", nShards = 4)
    val e = intercept[IllegalArgumentException] {
      Sinks.bloomCandidateShards(spark, t, "key", "k1")
    }
    assert(e.getMessage.contains("no bloom stats"))
    // ...and a manifest whose bloom column exists but is null for one
    // shard (simulated legacy carry): that shard must remain candidate
    val m = spark.read.parquet(s"$t/manifest")
    val doctored = m
      .withColumn("zbloom_key",
        when(col("shard") === 0L, lit(null))
          .otherwise(lit(null)).cast("array<bigint>"))
      .withColumn("zbloomk_key", lit(null).cast("int"))
    assert(doctored.columns.contains("zbloom_key"))
    // all-null blooms => every shard is a candidate (pure conservatism)
    val tmpM = Files.createTempDirectory("graft_bloomm_").toString + "/pub"
    Sinks.writeShards(corpus(100), tmpM, "id", nShards = 4)
    doctored.coalesce(1).write.mode("overwrite")
      .parquet(s"$tmpM/manifest")
    val cands = Sinks.bloomCandidateShards(spark, tmpM, "key", "k1")
    assert(cands.sorted == spark.read.parquet(s"$tmpM/manifest")
      .select("shard").as[Long].collect().sorted.toSeq)
    assert(Sinks.readShardsPoint(spark, tmpM, "key", "k1")
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("AUTOMATIC bloom pruning: a plain read + point filter gets the " +
       "shard conjunct from the planner rule, exactly") {
    val t = Files.createTempDirectory("graft_bloom_").toString + "/pub"
    Sinks.writeShards(corpus(400), t, "id", nShards = 8,
      bloomCols = Seq("key"))
    val q = spark.read.parquet(s"$t/data").filter(col("key") === "k251")
    // the user filter never mentions shard; any shard conjunct in the
    // optimized condition is the rule's injection (a single survivor
    // simplifies to `shard = N`, larger sets to IN/INSET)
    val cond = q.queryExecution.optimizedPlan.collectFirst {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _) => c
    }.map(_.toString).getOrElse("")
    assert(cond.matches("""(?s).*shard#\d+L? (=|IN).*"""),
      s"expected an injected shard conjunct in: $cond")
    assert(q.select("id").as[Long].collect().toSeq == Seq(251L))
    // IN-list point probes prune through the same arm
    val q2 = spark.read.parquet(s"$t/data")
      .filter(col("key").isin("k3", "k77"))
    assert(q2.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 77L))
    // and a value the corpus never held: zero candidate shards → the
    // rule injects a false conjunct, zero files read
    val q3 = spark.read.parquet(s"$t/data")
      .filter(col("key") === "never-there")
    assert(q3.isEmpty)
  }

  test("probe kernel parity: driver-side containsMaybe agrees with the " +
       "aggregate it probes") {
    val items = (0 until 500).map(i => s"item-$i")
    val mBits = BloomOps.sizeFor(500, 0.01)
    val k = BloomOps.hashesFor(500, mBits)
    val bits = items.toDF("s")
      .agg(BloomOps.bloomAgg(col("s"), mBits, k)).as[Array[Long]]
      .collect().head
    items.foreach(s => assert(BloomOps.containsMaybe(bits, k, s),
      s"false negative on $s — the one-sided contract is broken"))
    val fps = (0 until 2000).count(i =>
      BloomOps.containsMaybe(bits, k, s"absent-$i"))
    assert(fps < 2000 * 0.05, s"fp rate way above declared: $fps/2000")
  }
}
