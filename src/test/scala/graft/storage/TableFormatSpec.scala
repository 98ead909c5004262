package graft.storage

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import java.nio.file.Files

/** A second, deliberately non-parquet TableFormat: tables are lazy
  * DataFrame plans in a map. Exists to prove the seam is real — the
  * apps run unchanged against it (see the seam-proof test below), so
  * the Iceberg swap-in claim rests on the same mechanism, not on
  * parquet-shaped assumptions leaking through. */
class MemoryTableFormat extends TableFormat {
  import scala.collection.concurrent.TrieMap
  val tables = TrieMap.empty[String, DataFrame]
  // retired generations, keyed by retire stamp (monotonic counter)
  val versions = TrieMap.empty[String, Vector[(String, DataFrame)]]
  private val nextStamp = new java.util.concurrent.atomic.AtomicLong(1)

  override def read(spark: SparkSession, table: String): DataFrame =
    tables.getOrElse(table,
      throw new java.util.NoSuchElementException(s"no table $table"))
  override def append(df: DataFrame, table: String,
                      partitionCols: Seq[String]): Unit = {
    // materialize: an appended micro-batch plan may not be re-executable
    // after its source batch is gone
    val frozen = df.sparkSession.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(df.collect(): _*)), df.schema)
    tables.updateWith(table) {
      case Some(old) => Some(old.unionByName(frozen, allowMissingColumns = true))
      case None => Some(frozen)
    }
    ()
  }
  override def streamAppend(df: DataFrame, table: String, checkpoint: String,
                            partitionCols: Seq[String],
                            triggerMs: Long): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        append(b.toDF(), table, partitionCols)
      }
      .start()
  override def replace(df: DataFrame, table: String): Unit = {
    tables.remove(table); append(df, table, Nil)
  }
  override def upsert(spark: SparkSession, batch: DataFrame, table: String,
                      key: String, versionCol: String,
                      keepVersionCol: Boolean): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val existing = tables.get(table)
    val all = existing.map(_.unionByName(batch, allowMissingColumns = true))
      .getOrElse(batch)
    val w = Window.partitionBy(col(key)).orderBy(col(versionCol).desc_nulls_last)
    val merged0 = all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val merged = if (keepVersionCol) merged0 else merged0.drop(versionCol)
    // retire the previous generation before replacing (time travel)
    existing.foreach { prev =>
      val stamp = nextStamp.getAndIncrement().toString
      versions.updateWith(table) {
        case Some(v) => Some(v :+ (stamp, prev))
        case None => Some(Vector((stamp, prev)))
      }
    }
    this.replace(merged, table)
  }
  override def compact(spark: SparkSession, table: String,
                       targetBytes: Long): (Int, Int) = (1, 1)
  override def expireSnapshots(spark: SparkSession, table: String,
                               olderThanMs: Long): Int = {
    val n = versions.get(table).map(_.size).getOrElse(0)
    versions.remove(table)
    n
  }
  override def readAt(spark: SparkSession, table: String,
                      version: String): DataFrame =
    versions.getOrElse(table, Vector.empty).find(_._1 == version)
      .map(_._2)
      .getOrElse(throw new java.util.NoSuchElementException(
        s"version $version of $table is not retained"))
  override def listVersions(spark: SparkSession, table: String): Seq[String] =
    versions.getOrElse(table, Vector.empty).map(_._1)
  override def renameColumn(spark: SparkSession, table: String,
                            from: String, to: String): Unit = {
    tables.updateWith(table)(_.map(_.withColumnRenamed(from, to)))
    versions.updateWith(table)(_.map(_.map { case (s, df) =>
      (s, df.withColumnRenamed(from, to)) }))
    ()
  }
  override def dropColumn(spark: SparkSession, table: String,
                          column: String): Unit = {
    tables.updateWith(table)(_.map(_.drop(column)))
    versions.updateWith(table)(_.map(_.map { case (s, df) =>
      (s, df.drop(column)) }))
    ()
  }
  override def widenColumn(spark: SparkSession, table: String, column: String,
                           to: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.functions.col
    tables.updateWith(table)(_.map(_.withColumn(column, col(column).cast(to))))
    versions.updateWith(table)(_.map(_.map { case (s, df) =>
      (s, df.withColumn(column, col(column).cast(to))) }))
    ()
  }
}

/** Conformance of the parquet TableFormat implementation — the same
  * contract an Iceberg implementation would have to satisfy. */
class TableFormatSpec extends SparkTestBase {
  import spark.implicits._

  private val fmt: TableFormat = ParquetDirFormat

  private def tmp(): String =
    Files.createTempDirectory("graft_fmt_").toString + "/t"

  test("append/read/replace round-trip through the seam") {
    val t = tmp()
    fmt.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), t)
    fmt.append(Seq((3, "c")).toDF("id", "v"), t)
    assert(fmt.read(spark, t).count() == 3)
    fmt.replace(Seq((9, "z")).toDF("id", "v"), t)
    assert(fmt.read(spark, t).as[(Int, String)].collect().toSeq == Seq((9, "z")))
  }

  test("upsert merges on key; compact + expire maintain the table") {
    val t = tmp()
    fmt.upsert(spark, Seq(("k1", 1L, "old"), ("k2", 1L, "x")).toDF("k", "ver", "v"),
      t, "k", "ver")
    fmt.upsert(spark, Seq(("k1", 2L, "new")).toDF("k", "ver", "v"), t, "k", "ver")
    val rows = fmt.read(spark, t).select("k", "v").as[(String, String)]
      .collect().toMap
    assert(rows == Map("k1" -> "new", "k2" -> "x"))

    // many small appends -> compact to 1 file, snapshot then expires
    (0 until 5).foreach(i => fmt.append(Seq((s"x$i", 9L, "f")).toDF("k", "ver", "v"), t))
    val (before, after) = fmt.compact(spark, t, targetBytes = 1L << 30)
    assert(before > 1 && after == 1)
    assert(fmt.read(spark, t).count() == 7) // no duplication post-compaction
    // one maintenance door, two retention stores: the compaction file
    // snapshot AND the upsert-retired generation both expire here
    assert(fmt.expireSnapshots(spark, t) == 2)
  }

  test("time travel: readAt a retained version; expiry makes it fail loudly") {
    val t = tmp()
    fmt.upsert(spark, Seq(("k1", 1L, "v1a"), ("k2", 1L, "v1b"))
      .toDF("k", "ver", "v"), t, "k", "ver")
    // bootstrap upsert retires nothing — no version yet
    assert(fmt.listVersions(spark, t).isEmpty)
    fmt.upsert(spark, Seq(("k1", 2L, "v2a"), ("k3", 2L, "v2c"))
      .toDF("k", "ver", "v"), t, "k", "ver")
    val vs = fmt.listVersions(spark, t)
    assert(vs.size == 1, s"expected one retired generation, got $vs")
    // the live table shows v2, the retained version shows the exact
    // pre-upsert rows
    val live = fmt.read(spark, t).select("k", "v").as[(String, String)]
      .collect().toMap
    assert(live == Map("k1" -> "v2a", "k2" -> "v1b", "k3" -> "v2c"))
    val frozen = fmt.readAt(spark, t, vs.head).select("k", "v")
      .as[(String, String)].collect().toMap
    assert(frozen == Map("k1" -> "v1a", "k2" -> "v1b"))
    // a third upsert retires v2; both versions readable, oldest first
    fmt.upsert(spark, Seq(("k1", 3L, "v3a")).toDF("k", "ver", "v"),
      t, "k", "ver")
    val vs2 = fmt.listVersions(spark, t)
    assert(vs2.size == 2 && vs2.head == vs.head)
    assert(fmt.readAt(spark, t, vs2(1)).select("k", "v")
      .as[(String, String)].collect().toMap == live)
    // expiry: the versions are gone and readAt fails LOUDLY, never
    // silently returning the live table
    assert(fmt.expireSnapshots(spark, t) == 2)
    assert(fmt.listVersions(spark, t).isEmpty)
    val e = intercept[java.util.NoSuchElementException] {
      fmt.readAt(spark, t, vs.head)
    }
    assert(e.getMessage.contains("not retained"), e.getMessage)
    // an unknown version fails the same way on a healthy table
    intercept[java.util.NoSuchElementException] {
      fmt.readAt(spark, t, "0000000000000000000")
    }
  }

  test("schema evolution: metadata-only rename + add-column; upsert and both read doors resolve") {
    val t = tmp()
    // generation 1: pre-evolution schema
    fmt.upsert(spark, Seq((1L, "a", 10.5, 1L), (2L, "b", 20.5, 1L))
      .toDF("id", "name", "bal", "ver"), t, "id", "ver")
    // declare the rename — NO data rewrite happens here; the live read
    // must already resolve old files under the new name
    fmt.renameColumn(spark, t, "bal", "balance")
    val resolved = fmt.read(spark, t)
    assert(resolved.columns.contains("balance") && !resolved.columns.contains("bal"))
    assert(resolved.select("id", "balance").as[(Long, Double)].collect().toMap
      == Map(1L -> 10.5, 2L -> 20.5))
    // upsert AFTER evolution: batch carries the new name and a brand-new
    // column (add-column evolution, undeclared by design)
    fmt.upsert(spark, Seq((2L, "b", 0.0, "SEG", 2L))
      .toDF("id", "name", "balance", "seg", "ver"), t, "id", "ver")
    val live = fmt.read(spark, t)
    val liveRows = live.select("id", "balance", "seg")
      .as[(Long, Double, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(liveRows == Map(1L -> ((10.5, None)), 2L -> ((0.0, Some("SEG")))))
    // time travel: the retired PRE-EVOLUTION generation reads against
    // the EVOLVED schema — rename resolved, added column a typed null
    val vs = fmt.listVersions(spark, t)
    assert(vs.size == 1)
    val old = fmt.readAt(spark, t, vs.head)
    assert(old.schema.fieldNames.toSeq == live.schema.fieldNames.toSeq)
    assert(old.select("id", "balance", "seg")
      .as[(Long, Double, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
      == Map(1L -> ((10.5, None)), 2L -> ((20.5, None))))
    // chained rename replays in order on both doors
    fmt.renameColumn(spark, t, "balance", "bal2")
    assert(fmt.read(spark, t).columns.contains("bal2"))
    assert(fmt.readAt(spark, t, vs.head).columns.contains("bal2"))
    // validation: unknown source column and collision both fail loudly
    intercept[IllegalArgumentException] {
      fmt.renameColumn(spark, t, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      fmt.renameColumn(spark, t, "name", "bal2")
    }
  }

  test("schema evolution: a corrupt journal fails loudly, never silently unevolved") {
    val t = tmp()
    fmt.append(Seq((1L, 10.0)).toDF("id", "bal"), t)
    fmt.renameColumn(spark, t, "bal", "balance")
    // scribble over the journal (the LIVE stamped generation): a read
    // that silently ignored it would present the UN-evolved schema —
    // the wrong-answer failure mode
    val parent = new java.io.File(t).getParentFile
    val name = new java.io.File(t).getName
    val jp = parent.listFiles()
      .filter(f => f.getName.startsWith(name + "_evolution_") &&
        !f.getName.startsWith(name + "_evolution_tmp_"))
      .maxBy(_.getName)
    java.nio.file.Files.writeString(jp.toPath, "rename\tonly-two-fields\n")
    // drop the LocalFileSystem checksum sidecar so the PARSER's error
    // path is what engages (a checksum mismatch is loud too, but it's
    // not the contract under test)
    new java.io.File(jp.getParent, "." + jp.getName + ".crc").delete()
    val e = intercept[java.io.IOException] { fmt.read(spark, t).schema }
    assert(e.getMessage.contains("corrupt evolution journal"), e.getMessage)
  }

  test("schema evolution: stamped journal promote is monotonic — crash debris never vanishes it") {
    val t = tmp()
    fmt.append(Seq((1L, 10.0)).toDF("id", "bal"), t)
    fmt.renameColumn(spark, t, "bal", "balance")
    val parent = new java.io.File(t).getParentFile
    val name = new java.io.File(t).getName
    def journals = parent.listFiles()
      .filter(f => f.getName.startsWith(name + "_evolution_") &&
        !f.getName.startsWith(name + "_evolution_tmp_")).map(_.getName).sorted
    assert(journals.length == 1, journals.mkString(","))
    // a LEGACY unstamped journal plus a stamped one: stamped wins; the
    // next declaration retires the legacy file
    java.nio.file.Files.writeString(
      new java.io.File(parent, name + "_evolution").toPath, "rename\tstale\tx\n")
    assert(fmt.read(spark, t).columns.contains("balance"))
    // simulate a crashed promote: an orphan tmp beside the live journal
    // must neither shadow it nor survive the next promote's sweep
    java.nio.file.Files.writeString(
      new java.io.File(parent, name + "_evolution_tmp_9999999999999999999").toPath,
      "rename\tgarbage\ty\n")
    assert(fmt.read(spark, t).columns.contains("balance"))
    fmt.renameColumn(spark, t, "balance", "bal2")
    assert(journals.length == 1, journals.mkString(","))
    assert(!new java.io.File(parent, name + "_evolution").exists())
    assert(!parent.listFiles().exists(_.getName.startsWith(name + "_evolution_tmp_")))
    assert(fmt.read(spark, t).columns.contains("bal2"))
    // declarations against a NONEXISTENT table are refused (a journaled
    // typo would silently re-shape whatever is later created there)
    intercept[IllegalArgumentException] {
      fmt.renameColumn(spark, tmp() + "/nope", "a", "b")
    }
  }

  test("schema evolution: legacy unstamped journal still resolves when no stamped one exists") {
    val t = tmp()
    fmt.append(Seq((1L, 10.0)).toDF("id", "bal"), t)
    val parent = new java.io.File(t).getParentFile
    val name = new java.io.File(t).getName
    java.nio.file.Files.writeString(
      new java.io.File(parent, name + "_evolution").toPath, "rename\tbal\tbalance\n")
    assert(fmt.read(spark, t).columns.toSeq == Seq("id", "balance"))
  }

  test("schema evolution: declared DROP is metadata-only and both read doors project it away") {
    val t = tmp()
    fmt.upsert(spark, Seq((1L, "a", 10.5, 1L), (2L, "b", 20.5, 1L))
      .toDF("id", "name", "bal", "ver"), t, "id", "ver")
    fmt.upsert(spark, Seq((3L, "c", 30.5, 2L))
      .toDF("id", "name", "bal", "ver"), t, "id", "ver")
    fmt.dropColumn(spark, t, "bal")
    assert(fmt.read(spark, t).columns.sorted.toSeq == Seq("id", "name", "ver"))
    // time travel conforms the retired generation to the evolved shape
    val vs = fmt.listVersions(spark, t)
    assert(fmt.readAt(spark, t, vs.head).columns.sorted.toSeq == Seq("id", "name", "ver"))
    // validation: dropping an unknown column fails loudly
    intercept[IllegalArgumentException] { fmt.dropColumn(spark, t, "nope") }
    // upsert AFTER the drop: the merged generation no longer carries it
    fmt.upsert(spark, Seq((4L, "d", 3L)).toDF("id", "name", "ver"), t, "id", "ver")
    val live = fmt.read(spark, t)
    assert(live.columns.sorted.toSeq == Seq("id", "name", "ver"))
    assert(live.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("schema evolution: declared WIDEN casts narrow generations up on every read door") {
    import org.apache.spark.sql.types.{DoubleType, LongType, IntegerType}
    val t = tmp()
    fmt.upsert(spark, Seq((1, 10, 1.5f, 1L), (2, 20, 2.5f, 1L))
      .toDF("id", "qty", "score", "ver"), t, "id", "ver")
    fmt.widenColumn(spark, t, "qty", LongType)
    fmt.widenColumn(spark, t, "score", DoubleType)
    val live = fmt.read(spark, t)
    assert(live.schema("qty").dataType == LongType)
    assert(live.schema("score").dataType == DoubleType)
    assert(live.select("id", "qty").as[(Int, Long)].collect().toMap
      == Map(1 -> 10L, 2 -> 20L))
    // non-widening declarations are refused loudly
    intercept[IllegalArgumentException] {
      fmt.widenColumn(spark, t, "qty", IntegerType) // narrow: long -> int
    }
    intercept[IllegalArgumentException] {
      fmt.widenColumn(spark, t, "score", LongType) // lossy: double -> long
    }
    // upsert AFTER the widen: batch carries wide values that only fit
    // the widened type; merged generation materializes wide
    fmt.upsert(spark, Seq((3, 5000000000L, 3.5d, 2L))
      .toDF("id", "qty", "score", "ver"), t, "id", "ver")
    val after = fmt.read(spark, t)
    assert(after.schema("qty").dataType == LongType)
    assert(after.select("id", "qty").as[(Int, Long)].collect().toMap
      == Map(1 -> 10L, 2 -> 20L, 3 -> 5000000000L))
    // time travel: the narrow retired generation reads back WIDE
    val vs = fmt.listVersions(spark, t)
    val old = fmt.readAt(spark, t, vs.head)
    assert(old.schema("qty").dataType == LongType)
    assert(old.schema("score").dataType == DoubleType)
  }

  test("schema evolution: WIDEN on an APPEND dir with mixed narrow/wide files reads via the footer-sweep fallback") {
    import org.apache.spark.sql.types.LongType
    val t = tmp()
    fmt.append(Seq((1, 10)).toDF("id", "qty"), t)
    fmt.widenColumn(spark, t, "qty", LongType)
    // post-widen appends write the wide type — the dir now mixes int
    // and long physical files, which plain parquet schema-merge refuses
    fmt.append(Seq((2L, 5000000000L)).toDF("id", "qty")
      .selectExpr("cast(id as int) id", "qty"), t)
    val out = fmt.read(spark, t)
    assert(out.schema("qty").dataType == LongType)
    assert(out.select("id", "qty").as[(Int, Long)].collect().toMap
      == Map(1 -> 10L, 2 -> 5000000000L))
  }

  test("schema evolution on an APPEND dir: mixed-schema files merge and rename coalesces") {
    val t = tmp()
    fmt.append(Seq((1L, 10.0)).toDF("id", "bal"), t)
    fmt.renameColumn(spark, t, "bal", "balance")
    // post-rename appends write the new name — the dir now mixes files
    // with 'bal' and files with 'balance' (+ an added column), and the
    // read must present ONE evolved schema over both
    fmt.append(Seq((2L, 20.0, "x")).toDF("id", "balance", "extra"), t)
    val out = fmt.read(spark, t)
    assert(out.columns.sorted.toSeq == Seq("balance", "extra", "id"))
    assert(out.select("id", "balance", "extra")
      .as[(Long, Double, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
      == Map(1L -> ((10.0, None)), 2L -> ((20.0, Some("x")))))
  }

  test("seam proof: batch + streaming apps run against a NON-parquet format") {
    import graft.apps.{DwsLoginEnrich, Layout, UserPointsBatch}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val mem = new MemoryTableFormat
    val w = Files.createTempDirectory("graft_seam_").toString // checkpoints only

    // streaming app: dims read through the seam, wide rows written back
    mem.append(Seq(("uid1", "4")).toDF("user_id", "member_level"),
      Layout.dim(w, "DIM_MEMBER_INFO"), Nil)
    mem.append(Seq(("uid1", "Beijing")).toDF("user_id", "province"),
      Layout.dim(w, "DIM_MEMBER_ADDRESS"), Nil)
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = DwsLoginEnrich.run(spark, in.toDF().toDF("user_id", "login_tm"), w, mem)
    in.addData(("uid1", "2022-06-15 06:23:42"))
    q.processAllAvailable(); q.stop()
    val wide = mem.read(spark, Layout.dws(w, "USER_LOGIN"))
    assert(wide.select("user_id", "member_level", "province")
      .as[(String, String, String)].collect().toSeq == Seq(("uid1", "4", "Beijing")))

    // batch app reads the seam-written table and replaces its output table
    mem.append(Seq(("2022-06-15 06:23:42", "uid1", "prodA", "42"),
        ("2022-06-15 07:00:00", "uid1", "prodA", "8"))
      .toDF("log_time", "user_id", "product_name", "obtain_points"),
      Layout.dws(w, "BROWSE_INFO"), Nil)
    UserPointsBatch.run(spark, w, mem)
    val pts = mem.read(spark, Layout.dm(w, "user_points"))
      .select("user_id", "total_points").as[(String, Long)].collect()
    assert(pts.toSeq == Seq(("uid1", 50L)))
    // nothing leaked to disk: every table lives in the memory format
    assert(!new java.io.File(s"$w/lake").exists() && !new java.io.File(s"$w/dims").exists())
  }
}
