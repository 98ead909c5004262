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
    // a surviving in-flight marker means the previous run died MID-SWAP
    // — without healing, this run would treat whatever files remain
    // live as the whole level and silently finalize the loss (or bake
    // in the duplicates, for promoteFirst). Heal back to the pure old
    // generation first.
    healInflight(hfs, p)
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
    // A silent rename false here is worse than an abort: an un-moved
    // old file coexists with its compacted copy (permanent
    // double-count), and a silently un-promoted new file is destroyed
    // by the tmp delete below. Abort instead (shared checked-rename
    // helper); the resulting states are the crash windows the
    // in-flight marker makes self-healing.
    def moveOldAside(): Unit = dataFiles.foreach(st =>
      graft.sinks.Sinks.renameOrAbort(hfs, st.getPath,
        new Path(snap, st.getPath.getName), "compaction move-aside"))
    val newNames = hfs.listStatus(new Path(tmp))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName)
    def promote(): Unit = newNames.foreach(n =>
      graft.sinks.Sinks.renameOrAbort(hfs, new Path(new Path(tmp), n),
        new Path(p, n), "compaction promote"))
    // In-flight marker BEFORE the swap: the tmp/snap names plus the
    // exact new-generation file names. If this run dies or aborts
    // anywhere in the swap, the marker lets the NEXT run reconstruct
    // which live files are promoted-new (delete them — the rewrite is
    // reproducible), restore the snapshot, and re-compact — instead of
    // silently compacting a partial level (promoteFirst=false loses
    // the moved-aside rows forever; promoteFirst=true bakes in the
    // duplicates). Marker deleted only after the swap + tmp cleanup
    // fully land.
    val inflight = new Path(p, InflightMarker)
    writeText(hfs, inflight,
      (Seq(new Path(tmp).getName, snap.getName) ++ newNames).mkString("\n"))
    if (promoteFirst) { promote(); moveOldAside() }
    else { moveOldAside(); promote() }
    hfs.delete(new Path(tmp), true)
    hfs.delete(inflight, false)
    val after = hfs.listStatus(p)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (dataFiles.length + subBefore, after + subAfter)
  }

  /** Name of the per-level mid-swap marker — `private[graft]` so the
    * crash spec can construct died-mid-swap states. */
  private[graft] val InflightMarker = "_compact_inflight"

  /** Atomic text write: body to a temp sibling, then rename in. A
    * direct create+write+close can crash mid-write and leave a
    * truncated marker, which `healInflight`'s corrupt-marker abort
    * would then treat as needing manual repair — turning a routine
    * crash window into a stuck level. Rename is the same atomic
    * primitive every other swap step here already relies on, so a
    * reader observes either no marker or a complete one. */
  private def writeText(hfs: FileSystem, p: Path, text: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + s"_wip_${System.nanoTime()}")
    val out = hfs.create(tmp, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (hfs.exists(p)) hfs.delete(p, false)
    graft.sinks.Sinks.renameOrAbort(hfs, tmp, p, "marker write")
  }

  private def readText(hfs: FileSystem, p: Path): String = {
    val in = hfs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Roll a died-mid-swap level back to its pure OLD generation:
    * delete any promoted new-generation files (named in the marker —
    * the rewrite is reproducible, the old rows are not), restore every
    * snapshot file to the live dir, drop the tmp, marker LAST. A kill
    * anywhere mid-heal leaves the marker, so the next call re-heals —
    * each step is idempotent (deletes of the absent no-op; restores
    * skip names already live). Called before every compaction of the
    * level; also safe when the marker survived a run that actually
    * COMPLETED its swap (the heal then undoes a finished compaction —
    * wasted work, never lost rows — and the level recompacts). */
  private def healInflight(hfs: FileSystem, p: Path): Unit = {
    val inflight = new Path(p, InflightMarker)
    // sweep marker-write temps from a crash mid-writeText: never
    // renamed in, so the swap they were written for never started
    hfs.listStatus(p)
      .filter(st => st.isFile &&
        st.getPath.getName.startsWith(InflightMarker + "_wip_"))
      .foreach(st => hfs.delete(st.getPath, false))
    if (!hfs.exists(inflight)) return
    val lines = readText(hfs, inflight).split("\n").toSeq
    require(lines.size >= 2,
      s"corrupt $inflight — refusing to guess; inspect $p by hand")
    val (tmpDir, snapDir) = (new Path(p, lines.head), new Path(p, lines(1)))
    val newNames = lines.drop(2).filter(_.nonEmpty).toSet
    newNames.foreach { n =>
      val live = new Path(p, n)
      if (hfs.exists(live)) hfs.delete(live, false)
    }
    if (hfs.exists(snapDir))
      hfs.listStatus(snapDir).filter(_.isFile).foreach { st =>
        val live = new Path(p, st.getPath.getName)
        if (!hfs.exists(live))
          graft.sinks.Sinks.renameOrAbort(hfs, st.getPath, live,
            "compaction heal restore")
        else hfs.delete(st.getPath, false)
      }
    hfs.delete(snapDir, true)
    hfs.delete(tmpDir, true)
    hfs.delete(inflight, false)
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
    // a surviving in-flight marker means this level died mid-swap and
    // its newest snapshot holds the only copy of the moved-aside rows
    // until the next compaction heals — expiring it now would turn the
    // recoverable crash into data loss
    if (hfs.exists(new Path(dir, Compaction.InflightMarker))) return nested
    val expired = children.filter { st =>
      st.isDirectory && st.getPath.getName.startsWith("_snap_") &&
        st.getPath.getName.stripPrefix("_snap_").toLong < olderThanMs
    }
    expired.foreach(st => hfs.delete(st.getPath, true))
    expired.length + nested
  }
}
