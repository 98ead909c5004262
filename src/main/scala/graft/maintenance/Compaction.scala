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

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** M1: compact a parquet dir's data files toward `targetBytes` each.
    * Previous files are moved to `_snap_<epochMs>/` beside the data
    * (the "old snapshot"), so readers of the new generation see only
    * right-sized files. Returns (filesBefore, filesAfter). */
  def rewriteDataFiles(spark: SparkSession, dir: String,
                       targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val hfs = fs(spark)
    val p = new Path(dir)
    val dataFiles = hfs.listStatus(p).filter { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val tmp = dir.stripSuffix("/") + s"_compact_tmp"
    df.repartition(nOut).write.mode("overwrite").parquet(tmp)
    // move old generation into a snapshot dir, promote the new files
    val snap = new Path(p, s"_snap_${System.currentTimeMillis()}")
    hfs.mkdirs(snap)
    dataFiles.foreach(st => hfs.rename(st.getPath, new Path(snap, st.getPath.getName)))
    hfs.listStatus(new Path(tmp))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .foreach(st => hfs.rename(st.getPath, new Path(p, st.getPath.getName)))
    hfs.delete(new Path(tmp), true)
    val after = hfs.listStatus(p)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (dataFiles.length, after)
  }

  /** M2: expire snapshot generations older than `olderThanMs`
    * (epoch millis; the reference expires everything older than "now",
    * CombinDataAndRemoveOldSnap.scala:44-53). Returns dirs removed. */
  def expireSnapshots(spark: SparkSession, dir: String,
                      olderThanMs: Long = System.currentTimeMillis()): Int = {
    val hfs = fs(spark)
    val snaps = hfs.listStatus(new Path(dir)).filter { st =>
      st.isDirectory && st.getPath.getName.startsWith("_snap_")
    }
    val expired = snaps.filter(
      _.getPath.getName.stripPrefix("_snap_").toLong < olderThanMs)
    expired.foreach(st => hfs.delete(st.getPath, true))
    expired.length
  }
}
