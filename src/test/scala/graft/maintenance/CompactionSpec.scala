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

  test("a compaction that died mid-swap heals on the next run — no rows " +
    "lost, no duplicates baked in") {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // died-mid-swap state, built by hand: of old files A,B — A is
    // moved aside into the snapshot, B is still live, and one
    // (deliberately WRONG: missing B's rows) new file is already
    // promoted; the in-flight marker names it. A naive re-run would
    // compact {B, new} and lose A's rows forever; the heal must
    // instead delete the promoted new file, restore A, and re-compact
    // the true generation.
    def mkCrash(promotedNew: Boolean): (String, Seq[(Int, String)]) = {
      val dir = Files.createTempDirectory("graft_heal_").toString + "/t"
      (1 to 4).foreach { i =>
        Seq((i, s"row$i")).toDF("id", "s")
          .coalesce(1).write.mode("append").parquet(dir)
      }
      val truth = spark.read.parquet(dir).orderBy("id")
        .as[(Int, String)].collect().toSeq
      val p = new Path(dir)
      val live = fs.listStatus(p).filter(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet")).map(_.getPath)
      // the "rewrite": wrong on purpose (only row 1) so a heal that
      // kept it would be caught by value comparison
      val tmp = new Path(p, "_compact_tmp_1_1")
      Seq((1, "row1")).toDF("id", "s").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val newName = fs.listStatus(tmp).map(_.getPath.getName)
        .filter(_.endsWith(".parquet")).head
      val snap = new Path(p, "_snap_1")
      fs.mkdirs(snap)
      // A aside; B stays live
      fs.rename(live.head, new Path(snap, live.head.getName))
      if (promotedNew) fs.rename(new Path(tmp, newName), new Path(p, newName))
      val out = fs.create(new Path(p, Compaction.InflightMarker), true)
      try out.write(s"${tmp.getName}\n${snap.getName}\n$newName"
        .getBytes("UTF-8"))
      finally out.close()
      (dir, truth)
    }
    for (promotedNew <- Seq(true, false)) {
      val (dir, truth) = mkCrash(promotedNew)
      // expiry must refuse to touch the snapshot while the marker stands
      assert(Compaction.expireSnapshots(spark, dir,
        olderThanMs = System.currentTimeMillis() + 1000) == 0,
        "expiry must skip a level with an in-flight marker")
      val (_, nAfter) = Compaction.rewriteDataFiles(spark, dir,
        targetBytes = 1L << 30)
      assert(nAfter == 1)
      val healed = spark.read.parquet(dir).orderBy("id")
        .as[(Int, String)].collect().toSeq
      assert(healed == truth,
        s"promotedNew=$promotedNew: healed level lost or duplicated rows")
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir,
        Compaction.InflightMarker)), "marker must be gone after a clean run")
    }
  }
}
