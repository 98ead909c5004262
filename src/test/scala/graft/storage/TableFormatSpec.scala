package graft.storage

import graft.SparkTestBase
import java.nio.file.Files

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
    assert(fmt.expireSnapshots(spark, t) == 1)
  }
}
