package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sinks.Sinks

/** Metadata-only aggregates: COUNT/MIN/MAX over a published layout
  * answered from the manifest, bit-identical to the data scan. */
class ManifestAggregatesSpec extends SparkTestBase {

  private lazy val pub: String = {
    val dir = Files.createTempDirectory("graft_magg_").toString
    val df = spark.range(300).toDF("id")
      .withColumn("bucket", col("id") % 3)
      .withColumn("ts", (col("bucket") * 1000 + col("id")).cast("long"))
      // v is NOT zone-mapped: aggregates over it must keep the data scan
      .withColumn("v", col("id") * 2)
      // dt: a STRING zone column (ISO date stamps — the common text-
      // corpus shape); min/max must answer metadata-only for it too
      .withColumn("dt", date_format(
        date_add(to_date(lit("2021-01-01")), col("id").cast("int")),
        "yyyy-MM-dd"))
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 3,
      zoneCols = Seq("ts", "dt"), shardCol = Some("bucket"))
    s"$dir/pub"
  }

  private def read(): DataFrame = spark.read.parquet(s"$pub/data")

  /** (rows, scan locations in the executed plan). */
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

  test("count/min/max answered from the manifest, zero data files") {
    val (rows, locs) = run(read().agg(count(lit(1)).as("n"),
      min(col("ts")).as("lo"), max(col("ts")).as("hi")))
    assert(rows.head.getLong(0) == 300L)
    assert(rows.head.getLong(1) == 0L && rows.head.getLong(2) == 2299L)
    assert(locs == Seq("manifest"),
      s"expected a manifest-only scan, got scans of: $locs")
  }

  test("min/max of a STRING zone column answered from the manifest") {
    val (rows, locs) = run(read().agg(
      min(col("dt")).as("lo"), max(col("dt")).as("hi"),
      count(col("dt")).as("n")))
    assert(rows.head.getString(0) == "2021-01-01")
    assert(rows.head.getString(1) == "2021-10-27") // 2021-01-01 + 299d
    assert(rows.head.getLong(2) == 300L)
    assert(locs == Seq("manifest"),
      s"expected a manifest-only scan, got scans of: $locs")
  }

  test("Dataset.count() itself is answered metadata-only") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = read()
      assert(d.count() == 300L)
      val locs = d.groupBy().count().queryExecution.executedPlan.collect {
        case s: FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.getName).mkString(",")
      }
      assert(locs == Seq("manifest"),
        s"count() should plan manifest-only: $locs")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("kill switch keeps the data scan, same answer") {
    spark.conf.set("spark.graft.manifestAggregates.enabled", "false")
    try {
      val (rows, locs) = run(read().agg(count(lit(1)).as("n"),
        min(col("ts")).as("lo")))
      assert(rows.head.getLong(0) == 300L && rows.head.getLong(1) == 0L)
      assert(locs == Seq("data"), s"disabled rule must scan data: $locs")
    } finally spark.conf.set("spark.graft.manifestAggregates.enabled", "true")
  }

  test("a non-zone-mapped column keeps the data scan (all-or-nothing)") {
    val (rows, locs) = run(read().agg(count(lit(1)).as("n"),
      min(col("v")).as("vlo")))
    assert(rows.head.getLong(0) == 300L && rows.head.getLong(1) == 0L)
    assert(locs == Seq("data"),
      s"min over a column without stats must not rewrite: $locs")
  }

  test("a filtered aggregate with an unsupported sibling keeps data") {
    // all-or-nothing: avg has no stat recipe, so the whole filtered
    // aggregate stays on the row-level path
    val (rows, locs) = run(read().filter(col("ts") >= 1000)
      .agg(min(col("ts")).as("lo"), avg(col("ts")).as("m")))
    assert(rows.head.getLong(0) == 1001L)
    assert(locs.forall(_ != "manifest"),
      s"filtered avg must keep the whole aggregate on data: $locs")
  }

  test("a file-restricting reader option disables the metadata answer") {
    val sch = spark.read.parquet(s"$pub/data").schema
    // the glob matches nothing: the restricted scan's true count is 0,
    // and a manifest answer (300) would be silently wrong
    val (rows, locs) = run(spark.read.schema(sch)
      .option("pathGlobFilter", "*.nope").parquet(s"$pub/data")
      .agg(count(lit(1)).as("n")))
    assert(rows.head.getLong(0) == 0L,
      "restricted scan must aggregate what it reads")
    assert(locs.forall(_ != "manifest"), s"rule must not fire: $locs")
  }

  test("corrupt/missing-tolerant scans keep the data scan") {
    // a corrupt-tolerant scan can legitimately return FEWER rows than
    // the manifest describes — the rule must bail on the reader option
    // and on the session conf alike
    val (rowsOpt, locsOpt) = run(spark.read
      .option("ignoreCorruptFiles", "true").parquet(s"$pub/data")
      .agg(count(lit(1)).as("n")))
    assert(rowsOpt.head.getLong(0) == 300L)
    assert(locsOpt.forall(_ != "manifest"),
      s"rule must not fire under ignoreCorruptFiles option: $locsOpt")
    spark.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    try {
      val (rowsConf, locsConf) = run(read().agg(count(lit(1)).as("n")))
      assert(rowsConf.head.getLong(0) == 300L)
      assert(locsConf.forall(_ != "manifest"),
        s"rule must not fire under ignoreMissingFiles conf: $locsConf")
    } finally spark.conf.set("spark.sql.files.ignoreMissingFiles", "false")
  }

  test("avg/distinct shapes are untouched and still correct") {
    val (rows, locs) = run(read().agg(
      count_distinct(col("bucket")).as("buckets"), avg(col("ts")).as("m")))
    assert(rows.head.getLong(0) == 3L)
    assert(locs.forall(_ != "manifest"))
  }

  test("COUNT(col) uses recorded null counts; unknown counts bail") {
    val dir = Files.createTempDirectory("graft_magg_cnt_").toString
    val pub = s"$dir/pub"
    val df = spark.range(40).toDF("id")
      .withColumn("bucket", col("id") % 2)
      .withColumn("ts", when(col("bucket") === 0, col("id")))
    Sinks.writeShards(df, pub, "id", nShards = 2,
      zoneCols = Seq("ts"), shardCol = Some("bucket"))
    val (rows, locs) = run(spark.read.parquet(s"$pub/data")
      .agg(count(col("ts")).as("n")))
    assert(rows.head.getLong(0) == 20L, "nulls excluded from count(col)")
    assert(locs == Seq("manifest"), s"expected metadata-only: $locs")
    // simulate a legacy generation: strip the znull column from the
    // stored manifest — the rule must bail to the data scan, never
    // undercount from an unknown stat
    val m = spark.read.parquet(s"$pub/manifest")
    val legacy = m.drop("znull_ts")
    val tmp = s"$dir/legacy_manifest"
    legacy.coalesce(1).write.parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(pub)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$pub/manifest"), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$pub/manifest"))
    val (rows2, locs2) = run(spark.read.parquet(s"$pub/data")
      .agg(count(col("ts")).as("n")))
    assert(rows2.head.getLong(0) == 20L)
    assert(locs2 == Seq("data"),
      s"unknown null counts must keep the data scan: $locs2")
  }

  test("SUM of an integral zone column answered from the manifest") {
    val (rows, locs) = run(read().agg(
      sum(col("ts")).as("total"), count(lit(1)).as("n")))
    // Σ ts = Σ (bucket*1000 + id) = 1000*(100*0+100*1+100*2) + Σ id
    assert(rows.head.getLong(0) == 300000L + 300L * 299 / 2)
    assert(rows.head.getLong(1) == 300L)
    assert(locs == Seq("manifest"),
      s"expected a manifest-only SUM, got scans of: $locs")
  }

  test("SUM over a float column keeps the data scan") {
    val dir = Files.createTempDirectory("graft_magg_fsum_").toString
    val df = spark.range(50).toDF("id")
      .withColumn("bucket", col("id") % 2)
      .withColumn("x", col("id").cast("double") / 7)
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 2,
      zoneCols = Seq("x"), shardCol = Some("bucket"))
    val (rows, locs) = run(spark.read.parquet(s"$dir/pub/data")
      .agg(sum(col("x")).as("total")))
    assert(math.abs(rows.head.getDouble(0) -
      (0 until 50).map(_.toDouble / 7).sum) < 1e-9)
    assert(locs.forall(_ != "manifest"),
      s"float SUM is order-dependent and must scan data: $locs")
  }

  test("SUM with null shards: all-null shard skipped, legacy carry bails") {
    val dir = Files.createTempDirectory("graft_magg_zsum_").toString
    val pub = s"$dir/pub"
    // shard 1's ts is entirely null: zsum null, znull == n_rows — the
    // metadata answer must sum shard 0 only, like the scan does
    val df = spark.range(40).toDF("id")
      .withColumn("bucket", col("id") % 2)
      .withColumn("ts", when(col("bucket") === 0, col("id")))
    Sinks.writeShards(df, pub, "id", nShards = 2,
      zoneCols = Seq("ts"), shardCol = Some("bucket"))
    val (rows, locs) = run(spark.read.parquet(s"$pub/data")
      .agg(sum(col("ts")).as("total")))
    assert(rows.head.getLong(0) == (0 until 40 by 2).sum.toLong)
    assert(locs == Seq("manifest"), s"expected metadata-only: $locs")
    // legacy generation: strip znull — the all-null shard's NULL zsum
    // is now indistinguishable from an unknown carry; the rule must
    // bail to the data scan rather than guess
    val m = spark.read.parquet(s"$pub/manifest")
    val legacy = m.drop("znull_ts")
    val tmp = s"$dir/legacy_manifest"
    legacy.coalesce(1).write.parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(pub)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$pub/manifest"), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$pub/manifest"))
    val (rows2, locs2) = run(spark.read.parquet(s"$pub/data")
      .agg(sum(col("ts")).as("total")))
    assert(rows2.head.getLong(0) == (0 until 40 by 2).sum.toLong)
    assert(locs2 == Seq("data"),
      s"ambiguous NULL zsum must keep the data scan: $locs2")
  }

  test("MIN/MAX of the id column rewrite via min_id/max_id stats") {
    // `id` is the layout's identity column but NOT zone-mapped — the
    // spec_id stamp + the always-present min_id/max_id stats answer it
    val (rows, locs) = run(read().agg(
      min(col("id")).as("lo"), max(col("id")).as("hi")))
    assert(rows.head.getLong(0) == 0L && rows.head.getLong(1) == 299L)
    assert(locs == Seq("manifest"),
      s"expected id-stat metadata answer, got scans of: $locs")
  }

  test("a manifest without the spec_id stamp keeps the data scan for id") {
    val dir = Files.createTempDirectory("graft_magg_sid_").toString
    val pub = s"$dir/pub"
    val df = spark.range(30).toDF("id")
      .withColumn("bucket", col("id") % 2)
      .withColumn("ts", col("id") * 2)
    Sinks.writeShards(df, pub, "id", nShards = 2,
      zoneCols = Seq("ts"), shardCol = Some("bucket"))
    // simulate a pre-spec_id generation
    val m = spark.read.parquet(s"$pub/manifest")
    val legacy = m.drop("spec_id")
    val tmp = s"$dir/legacy_manifest"
    legacy.coalesce(1).write.parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(pub)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$pub/manifest"), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(s"$pub/manifest"))
    val (rows, locs) = run(spark.read.parquet(s"$pub/data")
      .agg(min(col("id")).as("lo"), max(col("ts")).as("hi")))
    assert(rows.head.getLong(0) == 0L && rows.head.getLong(1) == 58L)
    assert(locs == Seq("data"),
      s"unknown identity column must keep the data scan: $locs")
  }

  // --------------------------------- filtered metadata aggregates

  test("filtered count: full shards from metadata, partial shards scanned") {
    // shard ts ranges are disjoint ([0,297], [1001,1298], [2002,2299]):
    // ts in [1000, 2100] makes shard 1 provably FULL, shard 2 PARTIAL,
    // shard 0 disjoint
    val df = read().filter(col("ts") >= 1000 && col("ts") <= 2100)
      .agg(count(lit(1)).as("n"))
    val (rows, locs) = run(df)
    assert(rows.head.getLong(0) == 133L)
    assert(locs.toSet == Set("manifest", "data"),
      s"expected a manifest + partial-shard scan union, got: $locs")
    // the data side must carry shard partition filters (only the
    // partial shard's files are listed)
    val dataScans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.head.getName == "data" => s
    }
    assert(dataScans.nonEmpty && dataScans.forall(s =>
      s.partitionFilters.exists(_.references.exists(_.name == "shard"))),
      "partial branch must prune to the straddling shards")
  }

  test("filtered count: fully-aligned range is answered metadata-only") {
    val (rows, locs) = run(read().filter(col("ts") >= 1000)
      .agg(count(lit(1)).as("n")))
    assert(rows.head.getLong(0) == 200L)
    assert(locs == Seq("manifest"),
      s"aligned range must open zero data files: $locs")
  }

  test("filtered count: a non-zone conjunct keeps the data scan") {
    val (rows, locs) = run(read()
      .filter(col("ts") >= 1000 && col("v") > 10)
      .agg(count(lit(1)).as("n")))
    // v = id*2 > 10 ⇒ id ≥ 6; ts >= 1000 ⇒ id % 3 ∈ {1, 2}:
    // 294 ids in [6, 299], minus the 98 divisible by 3
    assert(rows.head.getLong(0) == 196L)
    assert(locs.forall(_ != "manifest"),
      s"unprovable conjunct must disable the rewrite: $locs")
  }

  test("filtered count: kill switch keeps the data scan, same answer") {
    spark.conf.set(
      "spark.graft.manifestAggregates.filteredCount.enabled", "false")
    try {
      val (rows, locs) = run(read().filter(col("ts") >= 1000)
        .agg(count(lit(1)).as("n")))
      assert(rows.head.getLong(0) == 200L)
      assert(locs.forall(_ != "manifest"), s"disabled: $locs")
    } finally spark.conf.set(
      "spark.graft.manifestAggregates.filteredCount.enabled", "true")
  }

  test("filtered count: null-bearing shards are never counted as full") {
    val dir = Files.createTempDirectory("graft_magg_fc_").toString
    val pub = s"$dir/pub"
    // shard 0 (even ids): ts = id, no nulls -> FULL for ts >= 0
    // shard 1 (odd ids): ts null on id % 4 == 1 -> znull > 0 -> PARTIAL
    val df = spark.range(60).toDF("id")
      .withColumn("bucket", col("id") % 2)
      .withColumn("ts",
        when(col("bucket") === 1 && col("id") % 4 === 1, lit(null))
          .otherwise(col("id")))
    Sinks.writeShards(df, pub, "id", nShards = 2,
      zoneCols = Seq("ts"), shardCol = Some("bucket"))
    val expected = df.filter(col("ts") >= 0).count()
    val (rows, locs) = run(spark.read.parquet(s"$pub/data")
      .filter(col("ts") >= 0).agg(count(lit(1)).as("n")))
    assert(rows.head.getLong(0) == expected)
    assert(locs.toSet == Set("manifest", "data"),
      s"null-bearing shard must be scanned, not trusted full: $locs")
  }

  test("filtered SUM/MIN/MAX/COUNT(col)/id-stats merge full + partial") {
    // shard ts ranges: s0 [0,297] (disjoint), s1 [1001,1298] (FULL),
    // s2 [2002,2299] (PARTIAL up to 2100). Expected values from the
    // arithmetic structure: shard k holds ids ≡ k (mod 3), ts = k*1000+id
    val s1Ids = (1 to 298 by 3)           // full shard
    val s2Ids = (2 to 100 by 3)           // partial shard, ts <= 2100
    val df = read().filter(col("ts") >= 1000 && col("ts") <= 2100)
      .agg(count(lit(1)).as("n"), sum(col("ts")).as("total"),
        min(col("ts")).as("lo"), max(col("ts")).as("hi"),
        count(col("ts")).as("nts"),
        min(col("id")).as("idlo"), max(col("id")).as("idhi"))
    val (rows, locs) = run(df)
    val r = rows.head
    assert(r.getLong(0) == (s1Ids.size + s2Ids.size).toLong)
    assert(r.getLong(1) ==
      s1Ids.map(_ + 1000L).sum + s2Ids.map(_ + 2000L).sum)
    assert(r.getLong(2) == 1001L && r.getLong(3) == 2098L) // max id≡2 (mod 3) ≤ 100 is 98
    assert(r.getLong(4) == (s1Ids.size + s2Ids.size).toLong)
    assert(r.getLong(5) == 1L && r.getLong(6) == 298L)
    assert(locs.toSet == Set("manifest", "data"),
      s"expected a manifest + partial-shard scan union, got: $locs")
  }

  test("filtered SUM/MIN/MAX on an aligned range is metadata-only") {
    val s1Ids = (1 to 298 by 3)
    val s2Ids = (2 to 299 by 3)
    val (rows, locs) = run(read().filter(col("ts") >= 1000)
      .agg(sum(col("ts")).as("total"), min(col("ts")).as("lo"),
        max(col("ts")).as("hi"), min(col("id")).as("idlo"),
        max(col("id")).as("idhi")))
    val r = rows.head
    assert(r.getLong(0) ==
      s1Ids.map(_ + 1000L).sum + s2Ids.map(_ + 2000L).sum)
    assert(r.getLong(1) == 1001L && r.getLong(2) == 2299L)
    assert(r.getLong(3) == 1L && r.getLong(4) == 299L)
    assert(locs == Seq("manifest"),
      s"aligned filtered sum/min/max must open zero data files: $locs")
  }

  // --------------------------------- grouped metadata aggregates

  // 9 shards: buckets 0-7 carry grp = "g" + (bucket % 4) — two shards
  // per group, single-group each; bucket 8 is entirely null-grp
  private lazy val gpub: String = {
    val dir = Files.createTempDirectory("graft_magg_grp_").toString
    val base = spark.range(100).toDF("id")
      .withColumn("bucket", col("id") % 8)
      .withColumn("grp", concat(lit("g"), (col("bucket") % 4)))
      .withColumn("x", col("id"))
    val nulls = spark.range(100, 110).toDF("id")
      .withColumn("bucket", lit(8L))
      .withColumn("grp", lit(null).cast("string"))
      .withColumn("x", col("id"))
    Sinks.writeShards(base.unionAll(nulls), s"$dir/pub", "id",
      nShards = 9, zoneCols = Seq("grp", "x"), shardCol = Some("bucket"))
    s"$dir/pub"
  }

  test("GROUP BY a single-group zone col answers from the manifest") {
    def q() = spark.read.parquet(s"$gpub/data").groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        min(col("x")).as("xlo"), max(col("x")).as("xhi"),
        count(col("grp")).as("ng"),
        min(col("id")).as("idlo"), max(col("id")).as("idhi"))
    // ground truth from the data scan with the door closed
    spark.conf.set("spark.graft.manifestAggregates.grouped.enabled", "false")
    val expected =
      try q().collect().toSeq.sortBy(r => Option(r.getString(0)))
      finally spark.conf.set(
        "spark.graft.manifestAggregates.grouped.enabled", "true")
    val (rows, locs) = run(q())
    assert(rows.sortBy(r => Option(r.getString(0))) == expected,
      "manifest answer must match the data scan exactly")
    assert(rows.length == 5) // g0..g3 + the NULL group
    assert(locs == Seq("manifest"),
      s"grouped aggregate must open zero data files: $locs")
  }

  test("SELECT DISTINCT over a single-group zone col is metadata-only") {
    val (rows, locs) = run(
      spark.read.parquet(s"$gpub/data").select("grp").distinct())
    assert(rows.map(r => Option(r.getString(0))).toSet ==
      Set(Some("g0"), Some("g1"), Some("g2"), Some("g3"), None))
    assert(locs == Seq("manifest"), s"expected metadata-only: $locs")
  }

  test("GROUP BY a multi-value-per-shard zone col keeps the data scan") {
    // the main fixture's ts varies within every shard
    val (rows, locs) = run(read().groupBy("ts")
      .agg(count(lit(1)).as("n")))
    assert(rows.length == 300)
    assert(locs == Seq("data"),
      s"non-single-group layout must scan data: $locs")
  }

  test("grouped kill switch keeps the data scan, same answer") {
    spark.conf.set("spark.graft.manifestAggregates.grouped.enabled", "false")
    try {
      val (rows, locs) = run(spark.read.parquet(s"$gpub/data")
        .groupBy("grp").agg(count(lit(1)).as("n")))
      assert(rows.length == 5)
      assert(locs == Seq("data"), s"disabled door must scan data: $locs")
    } finally spark.conf.set(
      "spark.graft.manifestAggregates.grouped.enabled", "true")
  }

  test("grouped avg/distinct aggregates keep the data scan") {
    val (rows, locs) = run(spark.read.parquet(s"$gpub/data")
      .groupBy("grp").agg(avg(col("x")).as("m")))
    assert(rows.length == 5)
    assert(locs == Seq("data"),
      s"avg has no stat recipe, the whole group-by must scan: $locs")
  }

  test("grouped + filtered: full shards from metadata, partial scanned") {
    // x >= 90: the null-grp shard (x 100-109) is provably FULL; shards
    // 0-7 (x up to 92..99) straddle and stay on the row-level path
    def q() = spark.read.parquet(s"$gpub/data")
      .filter(col("x") >= 90).groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        min(col("x")).as("xlo"), max(col("x")).as("xhi"))
    spark.conf.set("spark.graft.manifestAggregates.grouped.enabled", "false")
    val expected =
      try q().collect().toSeq.sortBy(r => Option(r.getString(0)))
      finally spark.conf.set(
        "spark.graft.manifestAggregates.grouped.enabled", "true")
    val (rows, locs) = run(q())
    assert(rows.sortBy(r => Option(r.getString(0))) == expected,
      "split answer must match the data scan exactly")
    assert(locs.toSet == Set("manifest", "data"),
      s"expected a manifest + partial-shard union, got: $locs")
  }

  test("grouped + filtered: aligned filter is answered metadata-only") {
    val (rows, locs) = run(spark.read.parquet(s"$gpub/data")
      .filter(col("x") >= 100).groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx")))
    // only the all-null-grp shard holds x >= 100: one NULL group
    assert(rows.length == 1 && rows.head.isNullAt(0))
    assert(rows.head.getLong(1) == 10L)
    assert(rows.head.getLong(2) == (100 until 110).sum.toLong)
    assert(locs == Seq("manifest"),
      s"aligned grouped filter must open zero data files: $locs")
  }

  test("grouped + filtered: a non-zone conjunct keeps the data scan") {
    val (rows, locs) = run(spark.read.parquet(s"$gpub/data")
      .filter(col("x") >= 100 && col("id") % 2 === 0).groupBy("grp")
      .agg(count(lit(1)).as("n")))
    assert(rows.length == 1 && rows.head.getLong(1) == 5L)
    assert(locs.forall(_ != "manifest"),
      s"unprovable conjunct must disable the rewrite: $locs")
  }

  test("all-null zone column: metadata min/max is null like the scan's") {
    val dir = Files.createTempDirectory("graft_magg_null_").toString
    val df = spark.range(40).toDF("id")
      .withColumn("bucket", col("id") % 2)
      .withColumn("ts", lit(null).cast("long"))
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 2,
      zoneCols = Seq("ts"), shardCol = Some("bucket"))
    val (rows, locs) = run(spark.read.parquet(s"$dir/pub/data")
      .agg(count(lit(1)).as("n"), min(col("ts")).as("lo")))
    assert(rows.head.getLong(0) == 40L && rows.head.isNullAt(1))
    assert(locs == Seq("manifest"), s"expected manifest-only: $locs")
  }
}
