package graft.maintenance

import graft.SparkTestBase
import java.nio.file.Files

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  test("M1/M2: compaction merges small files; expiry removes old snapshots") {
    val dir = Files.createTempDirectory("graft_compact_").toString + "/t"
    // 8 tiny files
    (1 to 8).foreach { i =>
      Seq((i, s"row$i")).toDF("id", "s")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).count()
    val (nBefore, nAfter) = Compaction.rewriteDataFiles(spark, dir, targetBytes = 1L << 30)
    assert(nBefore == 8 && nAfter == 1)
    // data preserved
    assert(spark.read.parquet(dir).count() == before)
    // snapshot exists, then expires
    val removed = Compaction.expireSnapshots(spark, dir,
      olderThanMs = System.currentTimeMillis() + 1000)
    assert(removed == 1)
    assert(spark.read.parquet(dir).count() == before)
  }

  test("M1 promoteFirst ordering reaches the same end state") {
    val dir = Files.createTempDirectory("graft_compact_pf_").toString + "/t"
    (1 to 6).foreach { i =>
      Seq((i, s"row$i")).toDF("id", "s")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq
    val (nBefore, nAfter) = Compaction.rewriteDataFiles(spark, dir,
      targetBytes = 1L << 30, promoteFirst = true)
    assert(nBefore == 6 && nAfter == 1)
    assert(spark.read.parquet(dir).orderBy("id").collect().toSeq == before)
    assert(Compaction.expireSnapshots(spark, dir,
      olderThanMs = System.currentTimeMillis() + 1000) == 1)
    assert(spark.read.parquet(dir).orderBy("id").collect().toSeq == before)
  }

  test("M1 on a hive-partitioned table compacts per partition, no row duplication") {
    val dir = Files.createTempDirectory("graft_compact_part_").toString + "/t"
    // two dt= partitions, 4 tiny files each (the streamAppend layout)
    (1 to 8).foreach { i =>
      Seq((i, s"row$i", s"2024-01-0${i % 2 + 1}")).toDF("id", "s", "dt")
        .coalesce(1).write.mode("append").partitionBy("dt").parquet(dir)
    }
    val before = spark.read.parquet(dir).orderBy("id")
      .select("id", "s", "dt").collect().toSeq
    val (nBefore, nAfter) = Compaction.rewriteDataFiles(spark, dir, targetBytes = 1L << 30)
    assert(nBefore == 8 && nAfter == 2) // one file per partition leaf
    val after = spark.read.parquet(dir).orderBy("id")
      .select("id", "s", "dt").collect().toSeq
    assert(after == before) // same rows, partition column intact, no dupes
    // nested snapshots expire too
    val removed = Compaction.expireSnapshots(spark, dir,
      olderThanMs = System.currentTimeMillis() + 1000)
    assert(removed == 2)
    assert(spark.read.parquet(dir).orderBy("id")
      .select("id", "s", "dt").collect().toSeq == before)
  }
}
