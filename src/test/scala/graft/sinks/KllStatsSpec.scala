package graft.sinks

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Manifest KLL quantile sketches (`zkll_*`) and the metadata-only
  * quantile door: rank accuracy of the merged estimate, rewrite
  * consistency across generations, time travel, null handling, the
  * strict legacy-carry refusal, and the SQL surface. */
class KllStatsSpec extends SparkTestBase {
  import spark.implicits._

  // 2000 rows, lengths 1..2000 — exact quantiles are trivial to state
  private def corpus = spark.range(1, 2001).toDF("id")
    .withColumn("len", col("id").cast("long"))
    .withColumn("payload", concat(lit("b"), col("id")))
    .localCheckpoint()

  /** True normalized rank of `v` among 1..2000: v/2000. */
  private def rankOf(v: Double): Double = v / 2000.0

  test("approxQuantilesShards answers p50/p95/p99 within 5% rank " +
       "error from the manifest alone") {
    val t = Files.createTempDirectory("graft_kll_").toString + "/pub"
    Sinks.writeShards(corpus, t, "id", nShards = 8,
      quantileCols = Seq("len"))
    val m = spark.read.parquet(s"$t/manifest")
    assert(m.columns.contains("zkll_len"))
    val got = Sinks.approxQuantilesShards(spark, t, "len",
        Seq(0.5, 0.95, 0.99))
      .orderBy("rank").as[(Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(0.5, 0.95, 0.99))
    got.foreach { case (q, v) =>
      assert(math.abs(rankOf(v) - q) <= 0.05,
        s"p$q answered $v (true rank ${rankOf(v)}) — rank error > 5%")
    }
  }

  test("delta publish recomputes quantile sketches for rewritten " +
       "shards; time travel answers the old distribution") {
    val t = Files.createTempDirectory("graft_kll_").toString + "/pub"
    Sinks.writeShards(corpus, t, "id", nShards = 8,
      quantileCols = Seq("len"), retainPrevious = true)
    // second generation: every length ×10 — the median moves 10×
    val v2 = corpus.withColumn("len", col("len") * 10L)
    Sinks.publishDelta(v2, t, "id", nShards = 8, retainPrevious = true)
    val now = Sinks.approxQuantilesShards(spark, t, "len", Seq(0.5))
      .as[(Double, Double)].collect().head._2
    assert(math.abs(now / 10.0 / 2000.0 - 0.5) <= 0.05,
      s"post-delta median $now should sit near 10000")
    val stamp = Sinks.listShardVersions(spark, t).last
    val old = Sinks.approxQuantilesShards(spark, t, "len", Seq(0.5),
      Some(stamp)).as[(Double, Double)].collect().head._2
    assert(math.abs(rankOf(old) - 0.5) <= 0.05,
      s"time-travel median $old should sit near 1000")
  }

  test("mergeRows rewrite keeps the quantile door answerable (zkll " +
       "recomputed under the inherited declaration)") {
    val t = Files.createTempDirectory("graft_kll_").toString + "/pub"
    Sinks.writeShards(corpus, t, "id", nShards = 4,
      quantileCols = Seq("len"))
    val patch = Seq((1L, 999999L, "patched")).toDF("id", "len", "payload")
    Sinks.mergeRows(spark, t, patch, "id")
    val m = spark.read.parquet(s"$t/manifest")
    assert(m.filter(col("zkll_len").isNull).isEmpty,
      "every shard must carry a sketch after a merge rewrite")
    val p99 = Sinks.approxQuantilesShards(spark, t, "len", Seq(1.0))
      .as[(Double, Double)].collect().head._2
    assert(p99 == 999999.0, s"max rank must see the merged row, got $p99")
  }

  test("nulls are excluded; an all-null shard publishes an EMPTY " +
       "sketch, not a null one") {
    val t = Files.createTempDirectory("graft_kll_").toString + "/pub"
    val df = spark.range(100).toDF("id")
      .withColumn("len", when(col("id") < 50, col("id") + 1L))
      .withColumn("bucket", (col("id") / 50).cast("long"))
    Sinks.writeShards(df, t, "id", nShards = 2,
      shardCol = Some("bucket"), quantileCols = Seq("len"))
    val m = spark.read.parquet(s"$t/manifest")
    assert(m.filter(col("zkll_len").isNull).isEmpty,
      "no shard may publish a null sketch")
    val p100 = Sinks.approxQuantilesShards(spark, t, "len", Seq(1.0))
      .as[(Double, Double)].collect().head._2
    assert(p100 == 50.0,
      s"nulls excluded: max of the 50 non-null lens is 50, got $p100")
  }

  test("a NULL sketch on a populated shard is refused; an undeclared " +
       "or non-numeric column fails loudly") {
    val t = Files.createTempDirectory("graft_kll_").toString + "/pub"
    Sinks.writeShards(corpus, t, "id", nShards = 4,
      quantileCols = Seq("len"))
    val m = spark.read.parquet(s"$t/manifest").localCheckpoint()
    m.withColumn("zkll_len",
        when(col("shard") === 0, lit(null)).otherwise(col("zkll_len")))
      .coalesce(1).write.mode("overwrite").parquet(s"$t/manifest")
    val err = intercept[IllegalStateException] {
      Sinks.approxQuantilesShards(spark, t, "len", Seq(0.5)).collect()
    }
    assert(err.getMessage.contains("legacy"))
    val miss = intercept[IllegalArgumentException] {
      Sinks.approxQuantilesShards(spark, t, "payload", Seq(0.5))
    }
    assert(miss.getMessage.contains("quantileCols"))
    val t2 = Files.createTempDirectory("graft_kll_").toString + "/p2"
    val nonNum = intercept[IllegalArgumentException] {
      Sinks.writeShards(corpus, t2, "id", nShards = 2,
        quantileCols = Seq("payload"))
    }
    assert(nonNum.getMessage.contains("numeric"))
  }

  test("grouped quantiles on a group-clustered layout answer per-group " +
       "ranks; a hash-sharded (mixed) layout refuses loudly") {
    val t = Files.createTempDirectory("graft_kll_").toString + "/pub"
    // two groups with DISJOINT length ranges: ga = 1..1000,
    // gb = 10001..11000 — per-group medians are unambiguous
    val df = spark.range(1, 2001).toDF("id")
      .withColumn("grp", when(col("id") <= 1000, lit("ga")).otherwise(lit("gb")))
      .withColumn("len",
        when(col("id") <= 1000, col("id")).otherwise(col("id") + 9000L))
      .withColumn("bucket",
        when(col("grp") === "ga", lit(0L)).otherwise(lit(1L)))
      .localCheckpoint()
    Sinks.writeShards(df, t, "id", nShards = 2, shardCol = Some("bucket"),
      zoneCols = Seq("grp"), quantileCols = Seq("len"))
    val got = Sinks.approxQuantilesShardsBy(spark, t, "len", "grp",
        Seq(0.5)).as[(String, Double, Double)].collect()
      .map { case (g, _, v) => g -> v }.toMap
    assert(math.abs(got("ga") - 500.0) / 1000.0 <= 0.05,
      s"ga median ${got("ga")} should sit near 500")
    assert(math.abs(got("gb") - 10500.0) / 1000.0 <= 0.05,
      s"gb median ${got("gb")} should sit near 10500")
    // the SQL TVF answers the same shape
    val tvf = spark.sql("SELECT grp, value FROM " +
        s"approx_quantiles_shards_by('$t', 'len', 'grp', '0.5')")
      .as[(String, Double)].collect().toMap
    assert(tvf.keySet == Set("ga", "gb") &&
      math.abs(tvf("ga") - got("ga")) <= 60.0)
    // hash-sharded layout: groups mix within shards — refuse
    val t2 = Files.createTempDirectory("graft_kll_").toString + "/p2"
    Sinks.writeShards(df.drop("bucket"), t2, "id", nShards = 4,
      zoneCols = Seq("grp"), quantileCols = Seq("len"))
    val err = intercept[IllegalStateException] {
      Sinks.approxQuantilesShardsBy(spark, t2, "len", "grp", Seq(0.5))
    }
    assert(err.getMessage.contains("single-group"))
  }

  test("quantile-guided rebin: equi-depth range shards planned from " +
       "the manifest sketch; range scans prune; later merges bin with " +
       "the published cuts") {
    val t = Files.createTempDirectory("graft_kll_").toString + "/pub"
    // scattered lengths (id*7919 mod 10000): hash-sharded publish
    // leaves every shard spanning the whole length range
    val df = spark.range(0, 4000).toDF("id")
      .withColumn("len", (col("id") * 7919L) % 10000L)
      .withColumn("payload", concat(lit("p"), col("id")))
      .localCheckpoint()
    Sinks.writeShards(df, t, "id", nShards = 8,
      zoneCols = Seq("len"), quantileCols = Seq("len"))
    Sinks.rebinShardsByQuantiles(spark, t, "id", "len", nShards = 8)
    // row count preserved, layout intact
    assert(spark.read.parquet(s"$t/data").count() == 4000L)
    assert(Sinks.verifyShards(spark, t, "id").filter(!col("ok")).isEmpty)
    // equi-depth: every non-empty shard within 2x of the mean
    val m = spark.read.parquet(s"$t/manifest")
    val sizes = m.select(col("n_rows")).as[Long].collect()
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.forall(s => s >= mean / 2 && s <= mean * 2),
      s"shard sizes ${sizes.toSeq} not equi-depth around $mean")
    // range clustering: zone ranges are (near-)disjoint — total
    // overlap-free ordering of (zmin, zmax) by shard cut order
    val zones = m.select(col("zmin_len"), col("zmax_len"))
      .as[(Long, Long)].collect().sortBy(_._1)
    zones.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"zones overlap: $hi > $lo2")
      case _ => ()
    }
    // a narrow range predicate now prunes most shards
    val pruned = Sinks.readShardsBetween(spark, t, "len", 0L, 1200L)
    val all = spark.read.parquet(s"$t/data").inputFiles.length
    assert(pruned.inputFiles.length < all,
      s"range scan should prune, opened ${pruned.inputFiles.length}/$all")
    assert(pruned.count() ==
      df.filter(col("len") >= 0L && col("len") <= 1200L).count())
    // the cuts are published; a later patch bins new rows with them —
    // read through the VERIFIED door (stamp + containment checked)
    val (cutsBinCol, cuts) = Sinks.qbinCuts(spark, t)
    assert(cutsBinCol == "len" && cuts.length == 7)
    val patch = Seq((9001L, 42L, "new-doc")).toDF("id", "len", "payload")
      .withColumn("qbin", Sinks.qbinExpr(cuts, col("len")))
    Sinks.mergeRows(spark, t, patch, "id")
    val got = spark.read.parquet(s"$t/data").filter(col("id") === 9001L)
      .select("shard").as[Long].collect()
    assert(got.length == 1 && got.head == 0L,
      s"len=42 belongs in the lowest bin, landed ${got.toSeq}")
    // RE-rebin under fresh cuts: the spec's own qbin is replaced (not
    // duplicated), rows survive, integrity holds
    Sinks.rebinShardsByQuantiles(spark, t, "id", "len", nShards = 4)
    assert(spark.read.parquet(s"$t/data").count() == 4001L)
    assert(spark.read.parquet(s"$t/data").columns.count(_ == "qbin") == 1)
    assert(Sinks.verifyShards(spark, t, "id").filter(!col("ok")).isEmpty)
    // a USER column named qbin (not the spec) is never silently
    // dropped — the rebin refuses
    val t3 = Files.createTempDirectory("graft_kll_").toString + "/p3"
    Sinks.writeShards(df.withColumn("qbin", lit(99L)), t3, "id",
      nShards = 4, quantileCols = Seq("len"))
    val clash = intercept[IllegalArgumentException] {
      Sinks.rebinShardsByQuantiles(spark, t3, "id", "len", nShards = 4)
    }
    assert(clash.getMessage.contains("qbin"))
  }

  test("shard_doctor summarizes a layout's health in one manifest row " +
       "and counts legacy carries the strict doors would refuse") {
    val t = Files.createTempDirectory("graft_kll_").toString + "/pub"
    Sinks.writeShards(corpus, t, "id", nShards = 8,
      zoneCols = Seq("len"), bloomCols = Seq("payload"),
      sketchCols = Seq("payload"), quantileCols = Seq("len"),
      retainPrevious = true)
    Sinks.mergeRows(spark, t,
      Seq((1L, 5L, "patched")).toDF("id", "len", "payload"), "id",
      retainPrevious = true)
    val d = spark.sql(s"SELECT * FROM shard_doctor('$t')").collect().head
    def f(n: String) = d.get(d.fieldIndex(n))
    assert(f("n_shards") == 8L && f("n_rows") == 2000L)
    assert(f("zone_cols") == "len" && f("bloom_cols") == "payload")
    assert(f("distinct_sketch_cols") == "payload" &&
      f("quantile_sketch_cols") == "len")
    assert(f("legacy_carry_shards") == 0L)
    assert(f("retained_versions") == 1L)
    assert(f("spec_n") == "8")
    val skew = d.getDouble(d.fieldIndex("skew"))
    assert(skew >= 1.0 && skew < 2.0, s"hash sharding should balance, $skew")
    // null one shard's quantile sketch: the doctor counts the carry
    val m = spark.read.parquet(s"$t/manifest").localCheckpoint()
    m.withColumn("zkll_len",
        when(col("shard") === 1, lit(null)).otherwise(col("zkll_len")))
      .coalesce(1).write.mode("overwrite").parquet(s"$t/manifest")
    val d2 = Sinks.shardDoctor(spark, t).collect().head
    assert(d2.getLong(d2.fieldIndex("legacy_carry_shards")) == 1L)
  }

  test("SQL surface: kll_sketch_agg/kll_merge_agg/kll_quantile and the " +
       "approx_quantiles_shards TVF answer the same ranks") {
    val t = Files.createTempDirectory("graft_kll_").toString + "/pub"
    Sinks.writeShards(corpus, t, "id", nShards = 8,
      quantileCols = Seq("len"))
    // pure-SQL pipeline over raw data: build → merge → read
    corpus.createOrReplaceTempView("kll_corpus")
    val sqlMedian = spark.sql(
      """SELECT kll_quantile(kll_merge_agg(sk), 0.5) AS p50 FROM (
        |  SELECT kll_sketch_agg(CAST(len AS DOUBLE)) AS sk
        |  FROM kll_corpus GROUP BY id % 4)""".stripMargin)
      .as[Double].collect().head
    assert(math.abs(rankOf(sqlMedian) - 0.5) <= 0.05,
      s"SQL median $sqlMedian outside 5% rank error")
    // the TVF answers from the manifest
    val tvf = spark.sql(
      s"SELECT rank, value FROM approx_quantiles_shards('$t', 'len', " +
        "'0.5,0.99') ORDER BY rank").as[(Double, Double)].collect()
    assert(tvf.map(_._1).toSeq == Seq(0.5, 0.99))
    tvf.foreach { case (q, v) =>
      assert(math.abs(rankOf(v) - q) <= 0.05,
        s"TVF p$q answered $v — rank error > 5%")
    }
    // the INVERSE door composes in pure SQL over the manifest TVF:
    // "what fraction of rows are <= 500" — true answer 0.25
    val share = spark.sql(
      "SELECT kll_rank(kll_merge_agg(zkll_len), 500.0) " +
        s"FROM shard_stats('$t')").as[Double].collect().head
    assert(math.abs(share - 0.25) <= 0.05,
      s"kll_rank(500) answered $share, true share 0.25")
  }
}
