package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Sampling
import graft.sinks.Sinks

/** Round-16 verdict task 7: the temperature mixers' COUNT pass priced
  * from the manifest. `mixByTemperature`/`mixByTemperatureUpsample`
  * scan the corpus once for the per-domain counts and once for the
  * filtered/replicated read; when the corpus is a PUBLISHED layout
  * sharded single-group on the domain (lang as shard + zone column —
  * the multilingual-corpus shape), the counts are already per-shard
  * manifest stats, and the grouped metadata-only rewrite
  * ([[ManifestAggregates]]) must answer that pass with ZERO data
  * files — one corpus scan for the whole mix instead of two. Values
  * must be bit-identical to the raw-frame run (the oracle law). */
class MixingManifestCountsSpec extends SparkTestBase {
  import spark.implicits._

  // 4 languages, skewed 60/20/12/8, sharded by language: every shard
  // is single-group on lang, so the manifest knows each n_d exactly
  private lazy val (pub, raw) = {
    val dir = Files.createTempDirectory("graft_mixmf_").toString
    val langOf = when(col("doc_id") % 10 < 6, "en")
      .when(col("doc_id") % 10 < 8, "de")
      .when(col("doc_id") % 10 < 9, "fr").otherwise("sw")
    val df = spark.range(2000).toDF("doc_id")
      .withColumn("lang", langOf)
      .withColumn("shard_key",
        when(col("lang") === "en", 0L).when(col("lang") === "de", 1L)
          .when(col("lang") === "fr", 2L).otherwise(3L))
    Sinks.writeShards(df, s"$dir/pub", "doc_id", nShards = 4,
      zoneCols = Seq("lang"), shardCol = Some("shard_key"))
    (s"$dir/pub", df.select("doc_id", "lang"))
  }

  /** (rows, file-scan root dirs) with AQE off so the executed plan is
    * inspectable — the ManifestAggregatesSpec convention. */
  private def run(df: DataFrame): (Seq[org.apache.spark.sql.Row], Seq[String]) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val rows = df.collect().toSeq
      val locs = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.getName).mkString(",")
      }
      (rows, locs)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def published(): DataFrame =
    spark.read.parquet(s"$pub/data").select("doc_id", "lang")

  test("mixByTemperature over a published corpus: counts side answers " +
    "from the manifest (one data scan), values equal the raw run") {
    val (rows, locs) = run(
      Sampling.mixByTemperature(published(), "lang", "doc_id", 0.5)
        .select("doc_id", "lang"))
    val expect = Sampling.mixByTemperature(raw, "lang", "doc_id", 0.5)
      .select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet == expect,
      "published-layout mix must keep exactly the raw-frame rows")
    assert(locs.count(_ == "manifest") >= 1,
      s"counts must read the manifest: $locs")
    assert(locs.count(_ == "data") == 1,
      s"exactly ONE corpus scan (the row side) — the count pass must " +
        s"open zero data files: $locs")
  }

  test("mixByTemperatureUpsample over a published corpus: same law — " +
    "manifest-priced counts, one data scan, exact multiset") {
    val (rows, locs) = run(Sampling.mixByTemperatureUpsample(
      published(), "lang", "doc_id", 0.5)
      .select("doc_id", "lang", "copy_idx"))
    val expect = Sampling.mixByTemperatureUpsample(raw, "lang", "doc_id", 0.5)
      .select("doc_id", "lang", "copy_idx")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    val got = rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(got == expect,
      "published-layout upsample must replicate the exact multiset")
    assert(locs.count(_ == "manifest") >= 1,
      s"counts must read the manifest: $locs")
    assert(locs.count(_ == "data") == 1,
      s"exactly ONE corpus scan: $locs")
  }

  test("null domains still drop, and a raw (unpublished) frame keeps " +
    "the two-scan plan with identical values") {
    // the post-aggregate null filter must not change the NULL policy
    val withNulls = raw.withColumn("lang",
      when(col("doc_id") < 50, lit(null).cast("string"))
        .otherwise(col("lang")))
    val out = Sampling.mixByTemperature(withNulls, "lang", "doc_id", 0.5)
    assert(out.filter(col("lang").isNull).count() == 0L,
      "NULL-domain rows must drop")
    // rarest real domain survives whole (n_min came from real domains,
    // not the null stratum)
    val sw = withNulls.filter(col("lang") === "sw").count()
    assert(out.filter(col("lang") === "sw").count() == sw)
  }
}
