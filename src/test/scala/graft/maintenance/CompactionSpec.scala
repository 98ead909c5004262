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
}
