package graft.maintenance

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Table maintenance — SURVEY §2.10.
  *
  * The reference runs Iceberg `rewriteDataFiles` (M1) and
  * `expireSnapshots` (M2) over its tables
  * (offlineanls/CombinDataAndRemoveOldSnap.scala:32-53). On an
  * Iceberg-enabled cluster those are the one-line procedures
  * `CALL lh.system.rewrite_data_files/expire_snapshots`; this module
  * provides the same capabilities for plain parquet table directories:
  * small files are rewritten into ~`targetBytes` files, the previous
  * generation is kept as a timestamped snapshot directory, and expiry
  * deletes snapshot generations older than a cutoff.
  */
object Compaction {

  /** Resolve the filesystem OF THE PATH (not the default FS) so
    * scheme-qualified table dirs (s3a://, hdfs://…) work. */
  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True for hive-partition-style child dirs (`k=v`, or anything not
    * prefixed `_`/`.` — Spark treats those as data, not metadata). */
  private def isPartitionDir(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** M1: compact a parquet table's data files toward `targetBytes` each.
    * Hive-partitioned layouts (`dt=.../part-*.parquet`, as written by
    * `Sinks.streamAppend(partitionCols)`) are compacted PER PARTITION
    * LEAF — compacting the root of a partitioned table would read every
    * partition's rows and promote a flattened copy next to the original
    * partition dirs, duplicating the table. Previous files are moved to
    * `_snap_<epochMs>/` beside the data (the "old snapshot"), so readers
    * of the new generation see only right-sized files.
    *
    * Crash-ordering knob: the default (`promoteFirst = false`) moves the
    * old generation aside BEFORE promoting the rewrite, so a reader never
    * sees a row twice — but a crash between the two steps leaves the live
    * dir empty until the snapshot is restored by hand. `promoteFirst =
    * true` inverts the order for DUPLICATE-TOLERANT readers (e.g. the
    * incremental-dedup posting stores, whose consumers `distinct()`
    * before thresholding): the worst crash window then shows both
    * generations at once — transient duplicates, never missing data.
    * Returns (filesBefore, filesAfter). */
  def rewriteDataFiles(spark: SparkSession, dir: String,
                       targetBytes: Long = 128L * 1024 * 1024,
                       promoteFirst: Boolean = false): (Int, Int) = {
    val p = new Path(dir)
    val hfs = fs(spark, p)
    // Drop STALE temp dirs from a crashed run (safe: data files only
    // leave the live dir after the snapshot move, so a temp is never
    // the only copy). Only the current `_compact_tmp_<epochMs>_<nano>`
    // shape is parsed — the age gate (24 h) is crash cleanup, not a
    // concurrency mechanism: like most table maintenance, compaction
    // assumes a SINGLE WRITER per table dir, and a second compactor
    // racing the same dir is unsupported regardless of this sweep.
    val staleBefore = System.currentTimeMillis() - 24L * 3600 * 1000
    val tmpName = "_compact_tmp_(\\d+)_(\\d+)".r
    hfs.listStatus(p)
      .filter { st =>
        st.isDirectory && (st.getPath.getName match {
          case tmpName(ms, _) => ms.toLongOption.exists(_ < staleBefore)
          case _ => false
        })
      }
      .foreach(st => hfs.delete(st.getPath, true))
    val children = hfs.listStatus(p)
    // recurse into partition subdirs first (handles nested dt=/hr=)
    val (subBefore, subAfter) = children
      .filter(st => st.isDirectory && isPartitionDir(st.getPath.getName))
      .map(st => rewriteDataFiles(spark, st.getPath.toString, targetBytes,
        promoteFirst))
      .foldLeft((0, 0)) { case ((b, a), (x, y)) => (b + x, a + y) }
    val dataFiles = children.filter { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
    if (dataFiles.isEmpty) return (subBefore, subAfter)
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // read exactly this level's files — never the partition subdirs
    val df = spark.read.parquet(dataFiles.map(_.getPath.toString).toSeq: _*)
    // temp dir INSIDE this level with a metadata prefix: a `dir_compact
    // _tmp` SIBLING of a partition leaf would read as a phantom
    // partition of the parent table during the compaction window (and
    // after a crash); underscore-prefixed dirs are invisible to Spark's
    // partition discovery
    val tmp = new Path(p,
      s"_compact_tmp_${System.currentTimeMillis()}_${System.nanoTime()}").toString
    df.repartition(nOut).write.mode("overwrite").parquet(tmp)
    // swap generations: snapshot-move the old files and promote the new
    // ones, in the order the reader can tolerate (see scaladoc). Spark's
    // part-file names embed a per-job UUID, so promoted names never
    // collide with the old generation's.
    val snap = new Path(p, s"_snap_${System.currentTimeMillis()}")
    hfs.mkdirs(snap)
    // `fs.rename` reports failure as FALSE, not an exception — and a
    // silent false here is worse than an abort: an un-moved old file
    // coexists with its compacted copy (permanent double-count), and a
    // silently un-promoted new file is destroyed by the tmp delete
    // below. Abort instead; the resulting states are the documented
    // crash windows (snapshot restorable / transient duplicates).
    def renameOrAbort(from: Path, to: Path): Unit =
      if (!hfs.rename(from, to))
        throw new java.io.IOException(
          s"compaction: rename $from -> $to failed; aborting (old " +
            "generation is in the snapshot dir / live dir, nothing deleted)")
    def moveOldAside(): Unit = dataFiles.foreach(st =>
      renameOrAbort(st.getPath, new Path(snap, st.getPath.getName)))
    def promote(): Unit = hfs.listStatus(new Path(tmp))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .foreach(st => renameOrAbort(st.getPath, new Path(p, st.getPath.getName)))
    if (promoteFirst) { promote(); moveOldAside() }
    else { moveOldAside(); promote() }
    hfs.delete(new Path(tmp), true)
    val after = hfs.listStatus(p)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (dataFiles.length + subBefore, after + subAfter)
  }

  /** M2: expire snapshot generations older than `olderThanMs`
    * (epoch millis; the reference expires everything older than "now",
    * CombinDataAndRemoveOldSnap.scala:44-53). Returns dirs removed. */
  def expireSnapshots(spark: SparkSession, dir: String,
                      olderThanMs: Long = System.currentTimeMillis()): Int = {
    val hfs = fs(spark, new Path(dir))
    val children = hfs.listStatus(new Path(dir))
    // snapshots of partitioned tables live inside the partition leaves
    val nested = children
      .filter(st => st.isDirectory && isPartitionDir(st.getPath.getName))
      .map(st => expireSnapshots(spark, st.getPath.toString, olderThanMs))
      .sum
    val expired = children.filter { st =>
      st.isDirectory && st.getPath.getName.startsWith("_snap_") &&
        st.getPath.getName.stripPrefix("_snap_").toLong < olderThanMs
    }
    expired.foreach(st => hfs.delete(st.getPath, true))
    expired.length + nested
  }
}
