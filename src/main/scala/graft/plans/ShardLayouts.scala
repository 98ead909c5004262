package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.LongType

/** Shared layout detection + manifest cache for the planner rules
  * ([[ZoneMapSkipping]], [[ManifestAggregates]]): is this relation a
  * scan of a [[graft.sinks.Sinks.writeShards]] layout's `data` dir,
  * and what does its manifest say?
  *
  * The manifest is one row per shard (bounded by the publish
  * contract), cached per generation: the version token digests the
  * manifest dir's file statuses, so a generation swap (promote
  * renames a NEW manifest dir into place) invalidates the entry and
  * the next plan reads the fresh stats. */
private[plans] object ShardLayouts {

  /** One cached manifest generation. `idCol` is the layout's declared
    * identity column (`spec_id` stamp) — the data column min_id/max_id
    * summarize — known only when EVERY manifest row agrees non-null on
    * it (a legacy generation carried forward by a delta publish has
    * spec_id = null, and id-stat rewrites must not guess). */
  final case class CachedManifest(token: Long,
                                  path: String,
                                  attrs: Seq[Attribute],
                                  rows: Array[InternalRow],
                                  shardOrdinal: Int,
                                  zoneCols: Set[String],
                                  bloomCols: Set[String],
                                  idCol: Option[String])

  private val manifests = new ConcurrentHashMap[String, CachedManifest]()

  /** Cheap structural check: single-root parquet scan of a dir named
    * `data` that partition-discovered `shard`. */
  def isLayoutScan(fsr: HadoopFsRelation): Boolean =
    fsr.fileFormat.isInstanceOf[ParquetFileFormat] &&
      fsr.location.rootPaths.lengthCompare(1) == 0 &&
      fsr.location.rootPaths.head.getName == "data" &&
      fsr.partitionSchema.fieldNames.contains("shard")

  /** Manifest-generation token: an order-SENSITIVE mixing fold (FNV-1a
    * steps) over the sorted (name, len, mtime) file tuples. A plain
    * XOR of per-file words is order-insensitive and self-cancelling,
    * so two republishes whose digests pairwise cancel (ms-granularity
    * mtimes make that plausible) would serve a stale cached manifest
    * and silently prune live shards. Callers that answer from a cached
    * manifest re-compute this and bail on mismatch. */
  def generationToken(fs: org.apache.hadoop.fs.FileSystem,
                      manifestPath: Path): Long =
    fs.listStatus(manifestPath)
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
      .sortBy(_._1)
      .foldLeft(-3750763034362895579L) { case (h, (name, len, mtime)) =>
        var acc = h
        def mix(v: Long): Unit = {
          acc ^= v
          acc *= 1099511628211L
        }
        mix(name.hashCode.toLong); mix(len); mix(mtime)
        acc
      }

  /** Load (or reuse) the manifest beside `dataDir`. None when there is
    * no readable manifest with zone stats — callers then leave the
    * plan alone; skipping/metadata answering are optimizations only,
    * so an unreadable or foreign "manifest" sibling must never fail
    * the user's query. */
  def manifestFor(spark: SparkSession, dataDir: Path): Option[CachedManifest] = {
    val manifestPath = new Path(dataDir.getParent, "manifest")
    try {
      val fs = manifestPath.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(manifestPath)) return None
      val token = generationToken(fs, manifestPath)
      val key = manifestPath.toString
      val cached = manifests.get(key)
      if (cached != null && cached.token == token) return statsOk(cached)
      val df = spark.read.parquet(key)
      val attrs = df.queryExecution.analyzed.output
      val shardOrdinal = attrs.indexWhere(_.name == "shard")
      if (shardOrdinal < 0 || attrs(shardOrdinal).dataType != LongType)
        return None
      val zoneCols = attrs.collect {
        case a if a.name.startsWith("zmin_") => a.name.stripPrefix("zmin_")
      }.toSet
      val bloomCols = attrs.collect {
        case a if a.name.startsWith("zbloom_") => a.name.stripPrefix("zbloom_")
      }.toSet
      // one row per shard by contract — the same bounded collect the
      // publisher's own manifest reads perform
      val rows = df.queryExecution.toRdd.map(_.copy()).collect()
      val specIdx = attrs.indexWhere(a => a.name == "spec_id" &&
        a.dataType == org.apache.spark.sql.types.StringType)
      val idCol =
        if (specIdx >= 0 && rows.nonEmpty &&
            rows.forall(!_.isNullAt(specIdx)) &&
            rows.iterator.map(_.getUTF8String(specIdx).toString)
              .toSet.size == 1)
          Some(rows.head.getUTF8String(specIdx).toString)
        else None
      val entry = CachedManifest(token, key, attrs, rows, shardOrdinal,
        zoneCols, bloomCols, idCol)
      if (manifests.size > 256) manifests.clear()
      manifests.put(key, entry)
      statsOk(entry)
    } catch {
      case _: Exception => None
    }
  }

  /** Range zones OR blooms make a manifest worth consulting; n_rows
    * alone also powers [[ManifestAggregates]]' COUNT(*), but a
    * stat-free manifest (neither family) is left alone to preserve
    * the historical zone-gated behavior of every consumer. */
  private def statsOk(m: CachedManifest): Option[CachedManifest] =
    if (m.zoneCols.nonEmpty || m.bloomCols.nonEmpty) Some(m) else None
}
