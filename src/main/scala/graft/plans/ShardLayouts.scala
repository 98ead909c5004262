package graft.plans

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType, MapType, StructType}

/** Shared layout detection + manifest cache for the planner rules
  * ([[ZoneMapSkipping]], [[ManifestAggregates]], [[TopKShardPruning]]):
  * is this relation a scan of a [[graft.sinks.Sinks.writeShards]]
  * layout's `data` dir, and what does its manifest say?
  *
  * The manifest is one row per shard (bounded by the publish
  * contract), cached per generation: the version token digests the
  * manifest dir's file statuses, so a generation swap (promote
  * renames a NEW manifest dir into place) invalidates the entry and
  * the next plan reads the fresh stats.
  *
  * Driver-memory posture (the 100 TB concern): a manifest at that
  * scale is ~10^5 rows, and its BLOB stats — `zbloom_*` bitsets,
  * `zhll_*`/`zkll_*` sketch payloads — dominate its bytes by three
  * orders of magnitude over the scalar zones. The cache therefore
  * holds only the SCALAR stat columns (everything the range/znull/
  * recipe machinery evaluates); blob columns are projected out before
  * the collect, loaded lazily per probed column through a separate
  * byte-bounded LRU ([[bloomFor]]), and both caches evict per-entry
  * (access-order LRU under a byte budget), never wholesale. */
private[plans] object ShardLayouts {

  /** One cached manifest generation, SCALAR stats only. `attrs`/`rows`
    * are the light projection (no array/binary/map/struct columns);
    * `fullSchema` is the manifest's complete schema for stat-family
    * discovery (which columns carry blooms/sketches). `idCol` is the
    * layout's declared identity column (`spec_id` stamp) — the data
    * column min_id/max_id summarize — known only when EVERY manifest
    * row agrees non-null on it (a legacy generation carried forward by
    * a delta publish has spec_id = null, and id-stat rewrites must not
    * guess). */
  final case class CachedManifest(token: Long,
                                  path: String,
                                  attrs: Seq[Attribute],
                                  rows: Array[InternalRow],
                                  shardOrdinal: Int,
                                  zoneCols: Set[String],
                                  bloomCols: Set[String],
                                  idCol: Option[String],
                                  fullSchema: StructType,
                                  sizeBytes: Long)

  /** One shard's bloom stat for one column, loaded lazily. Shards
    * whose bloom/k/type stamp is null (legacy carry) are simply absent
    * from the map — absent reads as unknown ⇒ keep, the same
    * conservatism the inline path had. */
  final case class ShardBloom(bits: Array[Long], k: Int, typeName: String)

  /** Per-(layout, column) bloom side: shard id → loaded bloom. */
  final case class BloomColumn(token: Long,
                               byShard: Map[Long, ShardBloom],
                               sizeBytes: Long)

  private val ManifestBudgetKey = "spark.graft.manifestCache.maxBytes"
  private val BloomBudgetKey = "spark.graft.bloomCache.maxBytes"
  private val DefaultManifestBudget = 256L << 20
  private val DefaultBloomBudget = 64L << 20

  /** Access-order LRU bounded by total value bytes: putting a new
    * entry evicts least-recently-used entries until the budget holds
    * (the incoming entry itself always fits — a single over-budget
    * manifest is still served, it just won't keep neighbors). */
  private final class ByteLru[V](sizeOf: V => Long) {
    private val map = new java.util.LinkedHashMap[String, V](16, 0.75f, true)
    private var total = 0L
    def get(key: String): Option[V] = synchronized(Option(map.get(key)))
    def put(key: String, value: V, budget: Long): Unit = synchronized {
      val prev = map.remove(key)
      if (prev != null) total -= sizeOf(prev)
      total += sizeOf(value)
      map.put(key, value)
      val it = map.entrySet().iterator()
      while (total > budget && map.size() > 1 && it.hasNext) {
        val eldest = it.next()
        if (eldest.getKey != key) {
          total -= sizeOf(eldest.getValue)
          it.remove()
        }
      }
    }
    def stats: (Int, Long) = synchronized((map.size(), total))
    def clear(): Unit = synchronized { map.clear(); total = 0L }
  }

  private val manifests = new ByteLru[CachedManifest](_.sizeBytes)
  private val blooms = new ByteLru[BloomColumn](_.sizeBytes)

  /** Cache introspection for specs: (entries, bytes) held driver-side
    * for the manifest cache and the lazy bloom cache. */
  private[graft] def manifestCacheStats: (Int, Long) = manifests.stats
  private[graft] def bloomCacheStats: (Int, Long) = blooms.stats
  private[graft] def clearCaches(): Unit = { manifests.clear(); blooms.clear() }

  private def budget(key: String, default: Long): Long =
    try SQLConf.get.getConfString(key, default.toString).toLong
    catch { case _: Exception => default }

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

  /** Scalar stat columns only: the blob families (bloom bitsets, HLL/
    * KLL sketch payloads — array/binary/nested types) are never read
    * by the cached-row machinery and must not be held driver-side per
    * generation. */
  private def isScalar(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case _: ArrayType | _: MapType | _: StructType | BinaryType => false
      case _ => true
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
      manifests.get(key) match {
        case Some(cached) if cached.token == token => return statsOk(cached)
        case _ =>
      }
      val full = spark.read.parquet(key)
      val fullSchema = full.schema
      val zoneCols = fullSchema.fieldNames.collect {
        case n if n.startsWith("zmin_") => n.stripPrefix("zmin_")
      }.toSet
      val bloomCols = fullSchema.fieldNames.collect {
        case n if n.startsWith("zbloom_") => n.stripPrefix("zbloom_")
      }.toSet
      // light projection: scalar stats only (zones, null/sum counts,
      // id range, spec stamp, bloom k/type stamps) — the blob payloads
      // stay on disk until a probe asks for exactly one column
      val lightNames = fullSchema.fields.filter(f => isScalar(f.dataType))
        .map(_.name)
      if (!lightNames.contains("shard")) return None
      val df = full.select(lightNames.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*)
      val attrs = df.queryExecution.analyzed.output
      val shardOrdinal = attrs.indexWhere(_.name == "shard")
      if (shardOrdinal < 0 || attrs(shardOrdinal).dataType != LongType)
        return None
      // one row per shard by contract — the same bounded collect the
      // publisher's own manifest reads perform, now blob-free
      val rows = df.queryExecution.toRdd.map(_.copy()).collect()
      val sizeBytes = rows.iterator.map {
        case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
          u.getSizeInBytes.toLong + 16L
        case _ => 64L + 16L * attrs.length
      }.sum + 1024L
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
        zoneCols, bloomCols, idCol, fullSchema, sizeBytes)
      manifests.put(key, entry,
        budget(ManifestBudgetKey, DefaultManifestBudget))
      statsOk(entry)
    } catch {
      case _: Exception => None
    }
  }

  /** Lazily load ONE bloomed column's per-shard bitsets for a cached
    * generation — the only stat whose evaluation needs blob payloads
    * driver-side. Loaded via a projected manifest read (column pruning
    * keeps every other blob on disk), keyed by (manifest, column),
    * token-validated, and held in a byte-bounded LRU of its own: at
    * 10^5 shards × 1 KB bitsets one column is ~100 MB, so only the
    * columns queries actually probe — and recently — stay resident.
    * None = unreadable/missing/stale ⇒ the caller keeps every shard
    * (pruning is an optimization only). */
  def bloomFor(spark: SparkSession, mf: CachedManifest,
               column: String): Option[BloomColumn] = try {
    if (!mf.bloomCols.contains(column)) return None
    val key = s"${mf.path}#$column"
    blooms.get(key) match {
      case Some(b) if b.token == mf.token => return Some(b)
      case _ =>
    }
    // the cached generation must still be live — a republish between
    // the manifest collect and this probe load would mix generations
    val mPath = new Path(mf.path)
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (generationToken(fs, mPath) != mf.token) return None
    val (b, k, t) = (s"zbloom_$column", s"zbloomk_$column",
      s"zbloomt_$column")
    val names = mf.fullSchema.fieldNames.toSet
    if (!names.contains(b) || !names.contains(k) || !names.contains(t))
      return None
    import org.apache.spark.sql.functions.col
    val loaded = spark.read.parquet(mf.path)
      .select(col("shard").cast("long"), col(b), col(k), col(t))
      .collect()
    var bytes = 256L
    val byShard = loaded.iterator.flatMap { r =>
      // null bits / null k / null type stamp = legacy carry: absent
      // from the map, read as unknown ⇒ keep
      if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2) || r.isNullAt(3))
        Iterator.empty
      else {
        val bits = r.getSeq[Long](1).toArray
        bytes += 48L + 8L * bits.length + 2L * r.getString(3).length
        Iterator.single(r.getLong(0) ->
          ShardBloom(bits, r.getInt(2), r.getString(3)))
      }
    }.toMap
    val entry = BloomColumn(mf.token, byShard, bytes)
    blooms.put(key, entry, budget(BloomBudgetKey, DefaultBloomBudget))
    Some(entry)
  } catch {
    case _: Exception => None
  }

  /** Range zones OR blooms make a manifest worth consulting; n_rows
    * alone also powers [[ManifestAggregates]]' COUNT(*), but a
    * stat-free manifest (neither family) is left alone to preserve
    * the historical zone-gated behavior of every consumer. */
  private def statsOk(m: CachedManifest): Option[CachedManifest] =
    if (m.zoneCols.nonEmpty || m.bloomCols.nonEmpty) Some(m) else None
}
