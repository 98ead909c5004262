package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sinks.Sinks

/** The automatic zone-map skipping rule: plain `spark.read.parquet`
  * over a published shard layout prunes files from manifest stats,
  * with bit-identical results to the unpruned scan. */
class ZoneMapSkippingSpec extends SparkTestBase {

  /** 400 rows in 4 ts-disjoint buckets: shard b holds ts in
    * [b*100, b*100+99], so a selective ts range survives one shard. */
  private lazy val pub: String = {
    val dir = Files.createTempDirectory("graft_zms_").toString
    val df = spark.range(400).toDF("id")
      .withColumn("bucket", col("id") % 4)
      .withColumn("ts",
        (col("bucket") * 100 + floor(col("id") / 4) % 100).cast("long"))
      .withColumn("cat", concat(lit("c"), col("bucket")))
      .withColumn("d", date_add(to_date(lit("2020-01-01")),
        col("ts").cast("int")))
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 4,
      zoneCols = Seq("ts", "cat", "d"), shardCol = Some("bucket"))
    s"$dir/pub"
  }

  /** Run `build` with AQE off (stable physical tree for metric reads),
    * collect it, and return (rows, filesOpened, partitionFilters). */
  private def scanned(build: => DataFrame): (Seq[Long], Long, String) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = build
      val out = q.collect()
      val idIdx = q.columns.indexOf("id")
      val rows = out.map(_.getLong(idIdx)).toSeq.sorted
      // metrics must come from the EXECUTED plan (an empty survivor
      // set can optimize the scan away entirely → 0 files)
      val scans = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      (rows, scans.headOption.map(_.metrics("numFiles").value).getOrElse(0L),
        scans.headOption.map(_.metadata.getOrElse("PartitionFilters", ""))
          .getOrElse(""))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def read(): DataFrame = spark.read.parquet(s"$pub/data")

  test("range filter prunes shards automatically and loses nothing") {
    val (all, totalFiles, _) = scanned(read())
    assert(all.size == 400 && totalFiles >= 4, s"layout: $totalFiles files")
    val (rows, files, pf) =
      scanned(read().filter(col("ts") >= 150 && col("ts") <= 180))
    val expected = (0 until 400).map(_.toLong)
      .filter(i => { val t = (i % 4) * 100 + (i / 4) % 100; t >= 150 && t <= 180 })
    assert(rows == expected, "pruned read must equal the plain filter")
    assert(files < totalFiles,
      s"expected file skipping: opened $files of $totalFiles")
    assert(pf.contains("shard"), s"no shard partition filter in: $pf")
  }

  test("kill switch disables pruning without changing results") {
    spark.conf.set("spark.graft.zoneMapSkipping.enabled", "false")
    try {
      val (rows, files, _) =
        scanned(read().filter(col("ts") >= 150 && col("ts") <= 180))
      val (_, totalFiles, _) = scanned(read())
      assert(files == totalFiles, s"disabled rule must not prune: $files")
      assert(rows.nonEmpty)
    } finally spark.conf.set("spark.graft.zoneMapSkipping.enabled", "true")
  }

  test("equality and IN predicates prune on a string zone column") {
    val (_, totalFiles, _) = scanned(read())
    val (eqRows, eqFiles, _) = scanned(read().filter(col("cat") === "c2"))
    assert(eqRows == (0 until 400).map(_.toLong).filter(_ % 4 == 2))
    assert(eqFiles < totalFiles, s"equality should prune: $eqFiles")
    val (inRows, inFiles, _) =
      scanned(read().filter(col("cat").isin("c0", "c3")))
    assert(inRows == (0 until 400).map(_.toLong)
      .filter(i => i % 4 == 0 || i % 4 == 3))
    assert(inFiles < totalFiles, s"IN should prune: $inFiles")
  }

  test("range predicates prune on a DATE-typed zone column") {
    // shard b holds d in [2020-01-01 + b*100, +99] days — a one-week
    // date range survives one shard
    val (_, totalFiles, _) = scanned(read())
    val (rows, files, pf) = scanned(read().filter(
      col("d") >= to_date(lit("2020-05-30")) && // ts 150
        col("d") <= to_date(lit("2020-06-29")))) // ts 180
    val expected = (0 until 400).map(_.toLong)
      .filter(i => { val t = (i % 4) * 100 + (i / 4) % 100; t >= 150 && t <= 180 })
    assert(rows == expected, "date-pruned read must equal the plain filter")
    assert(files < totalFiles, s"expected date pruning: $files/$totalFiles")
    assert(pf.contains("shard"), s"no shard partition filter in: $pf")
  }

  test("LIKE-prefix predicates prune via the byte-successor bound") {
    val (_, totalFiles, _) = scanned(read())
    val (rows, files, _) = scanned(read().filter(col("cat").startsWith("c2")))
    assert(rows == (0 until 400).map(_.toLong).filter(_ % 4 == 2))
    assert(files < totalFiles, s"prefix should prune: $files/$totalFiles")
  }

  test("IS NOT NULL prunes all-null shards") {
    val dir = Files.createTempDirectory("graft_zms_nn_").toString
    val df = spark.range(100).toDF("id")
      .withColumn("bucket", col("id") % 2)
      .withColumn("ts", when(col("bucket") === 0, col("id")))
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 2,
      zoneCols = Seq("ts"), shardCol = Some("bucket"))
    val (rows, files, _) = scanned(
      spark.read.parquet(s"$dir/pub/data").filter(col("ts").isNotNull))
    assert(rows == (0L until 100L by 2).toSeq)
    assert(files == 1, s"the all-null shard should be skipped: $files")
  }

  test("empty survivor set returns an empty frame, not an error") {
    val (rows, _, _) = scanned(read().filter(col("ts") > 100000))
    assert(rows.isEmpty)
  }

  test("all-null zone shard is skipped exactly (nulls can't match)") {
    val dir = Files.createTempDirectory("graft_zms_null_").toString
    val df = spark.range(100).toDF("id")
      .withColumn("bucket", col("id") % 2)
      // bucket 1's ts is entirely NULL → its zmin/zmax are null
      .withColumn("ts", when(col("bucket") === 0, col("id")))
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 2,
      zoneCols = Seq("ts"), shardCol = Some("bucket"))
    val (rows, files, _) = scanned(
      spark.read.parquet(s"$dir/pub/data").filter(col("ts") >= 10))
    // the plain filter excludes null ts either way — same answer
    assert(rows == (10L until 100L by 2).toSeq.sorted)
    assert(files == 1, s"the all-null shard should be skipped: $files")
  }

  test("a condition already naming shard is left alone") {
    val (rows, _, pf) = scanned(
      read().filter(col("shard") === 1 && col("ts") >= 150 && col("ts") <= 180))
    assert(rows == (0 until 400).map(_.toLong)
      .filter(i => { val t = (i % 4) * 100 + (i / 4) % 100
        i % 4 == 1 && t >= 150 && t <= 180 }))
    // exactly the user's own shard predicate — no IN list added
    assert(!pf.contains("IN"), s"rule must skip shard-aware filters: $pf")
  }

  test("republish invalidates the cached manifest generation") {
    val dir = Files.createTempDirectory("graft_zms_regen_").toString
    def publish(shift: Int): Unit = {
      val df = spark.range(100).toDF("id")
        .withColumn("bucket", col("id") % 2)
        .withColumn("ts",
          (col("bucket") * 100 + floor(col("id") / 2) % 50 + shift).cast("long"))
      Sinks.writeShards(df, s"$dir/pub", "id", nShards = 2,
        zoneCols = Seq("ts"), shardCol = Some("bucket"))
    }
    publish(0)
    val (r1, _, _) = scanned(
      spark.read.parquet(s"$dir/pub/data").filter(col("ts") >= 100))
    assert(r1 == (1L until 100L by 2).toSeq, "generation 1: bucket-1 rows")
    publish(1000) // every ts now ≥ 1000 — old stats would prune wrongly
    val (r2, _, _) = scanned(
      spark.read.parquet(s"$dir/pub/data").filter(col("ts") >= 100))
    assert(r2 == (0L until 100L).toSeq,
      "generation 2 must be replanned from the fresh manifest")
  }

  test("time travel prunes too: a retained generation carries its manifest") {
    val dir = Files.createTempDirectory("graft_zms_tt_").toString
    val pub = s"$dir/pub"
    def gen(shift: Int) = spark.range(100).toDF("id")
      .withColumn("bucket", col("id") % 2)
      .withColumn("ts",
        (col("bucket") * 100 + floor(col("id") / 2) % 50 + shift).cast("long"))
    Sinks.writeShards(gen(0), pub, "id", nShards = 2,
      zoneCols = Seq("ts"), shardCol = Some("bucket"))
    Sinks.publishDelta(gen(7), pub, "id", nShards = 2,
      retainPrevious = true, zoneCols = Seq("ts"), shardCol = Some("bucket"))
    val stamp = Sinks.listShardVersions(spark, pub).last
    // readShardsAt scans $pub/_versions/<stamp>/data — whose SIBLING
    // manifest is the retired generation's, so the rule prunes with
    // the stats that described THAT data, not the live generation's
    val (rows, files, _) = scanned(
      Sinks.readShardsAt(spark, pub, stamp).filter(col("ts") >= 100))
    assert(rows == (1L until 100L by 2).toSeq,
      "time-travel read must answer from the retired generation")
    assert(files == 1, s"retired generation should prune to 1 file: $files")
  }

  test("IS NULL prunes shards whose recorded null count is zero") {
    val dir = Files.createTempDirectory("graft_zms_isnull_").toString
    val df = spark.range(100).toDF("id")
      .withColumn("bucket", col("id") % 2)
      // bucket 1 holds all the nulls; bucket 0 records znull = 0
      .withColumn("ts", when(col("bucket") === 0, col("id")))
    Sinks.writeShards(df, s"$dir/pub", "id", nShards = 2,
      zoneCols = Seq("ts"), shardCol = Some("bucket"))
    val (rows, files, _) = scanned(
      spark.read.parquet(s"$dir/pub/data").filter(col("ts").isNull))
    assert(rows == (1L until 100L by 2).toSeq)
    assert(files == 1, s"the null-free shard should be skipped: $files")
  }

  test("a read schema overriding a zone column's type disables pruning") {
    import org.apache.spark.sql.types._
    // declare ts as STRING while the stats are LONG: planning must
    // neither compare across types nor fail the query — it skips
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("ts", StringType), StructField("cat", StringType)))
    val q = spark.read.schema(sch).parquet(s"$pub/data")
      .filter(col("ts") >= "150")
    // planning succeeds and adds no shard conjunct
    val plan = q.queryExecution.optimizedPlan.toString
    assert(!plan.contains("shard#") ||
      !plan.toLowerCase.contains("shard in"), s"unexpected pruning: $plan")
  }

  test("a plain parquet dir named data is not touched") {
    val dir = Files.createTempDirectory("graft_zms_plain_").toString
    spark.range(50).toDF("id").withColumn("ts", col("id"))
      .write.parquet(s"$dir/data")
    val rows = spark.read.parquet(s"$dir/data").filter(col("ts") >= 25)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(rows == (25L until 50L).toSeq)
  }
}
