package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.CentroidOps
import graft.functions.Vectors

/** STORAGE-INTEGRATED vector search: an IVF index persisted as a
  * shard layout of the engine's table format, so approximate top-k
  * over a lake-scale embedding corpus opens only the shards that can
  * hold a query's nearest cells.
  *
  * [[graft.operators.Similarity.ivfTopK]] prunes the SCAN'S ROWS
  * (each query scores one cell's rows) but still READS the whole
  * corpus every search. At 100 TB that read is the bill. This door
  * moves the cell structure into the STORAGE layout:
  *
  *  - '''publish''': assign every corpus vector its nearest coarse
  *    centroid (collect-free — the centroid frame is broadcast-packed,
  *    [[Similarity.assignCellsFrame]]), CLUSTER shards by cell
  *    (shard = floor(cell·nShards/nCells), so each shard holds a
  *    contiguous cell range and the manifest's `zmin_cell/zmax_cell`
  *    are tight), and publish through [[graft.sinks.Sinks.writeShards]]
  *    with zone maps on `cell`. The centroid set rides beside the
  *    layout (`$root/centroids`) as model metadata — k≈√n rows, the
  *    same planning-scale envelope as the manifest itself.
  *  - '''topK''': route each query vector to its `nProbe` nearest
  *    cells (one broadcast-packed projection over the QUERY batch —
  *    never the corpus), open only the shards whose zone range
  *    intersects the probed cells ([[graft.sinks.Sinks.readShardsIn]]),
  *    and run the bounded-heap cosine top-k inside the survivors.
  *    Per-search I/O drops from O(corpus) to
  *    ~O(corpus · |probed cells| / nCells) — the pruning the manifest
  *    zone stats already give range scans, applied to vector search.
  *
  * Recall is the IVF trade: a true neighbor assigned to an unprobed
  * cell is missed; `nProbe` tunes it (QUALITY.json floors the measured
  * recall on the fixture corpus). Everything INSIDE the probed cells
  * is scored exactly — scores are bit-identical to the brute-force
  * door on the same pairs. */
object VectorIndex {

  /** Train (or accept) coarse centroids, assign cells collect-free,
    * and publish the cell-clustered layout + centroid side table.
    *
    * `centroids`: None trains k-means on the corpus
    * ([[Similarity.kmeansCentroids]] — driver-budgeted, loud error
    * past the literal budget); Some(frame) with (`cid`, `cv`) columns
    * uses externally-trained centroids (the 100 TB path: train on a
    * sample offline, publish with the frame, nothing ever collected).
    * Cell ids must be dense 0..nCells-1 — the shard mapping needs the
    * range to cluster contiguously. */
  def publish(corpus: DataFrame, root: String, idCol: String,
              vecCol: String, nCells: Int, nShards: Int,
              centroids: Option[DataFrame] = None,
              iters: Int = 3): Unit = {
    val spark = corpus.sparkSession
    require(!corpus.columns.exists(c =>
        c.equalsIgnoreCase("cell") || c.equalsIgnoreCase("vshard")),
      "publish derives `cell` and `vshard` columns; rename the input's")
    val centFrame = centroids.getOrElse {
      val (ids, cents) = Similarity.kmeansCentroids(corpus, vecCol, nCells, iters)
      import spark.implicits._
      ids.zip(cents).toSeq
        .map { case (cid, cv) => (cid, cv.toSeq) }.toDF("cid", "cv")
    }
    // dense-id contract, checked on the tiny centroid frame: the
    // contiguous shard mapping below is meaningless on sparse ids
    val nC = {
      val r = centFrame.agg(count(lit(1)), min(col("cid")), max(col("cid")))
        .collect().head
      val (n, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2))
      require(lo == 0L && hi == n - 1,
        s"centroid ids must be dense 0..n-1 (got [$lo, $hi] over $n rows)")
      n
    }
    val assigned = Similarity
      .assignCellsFrame(corpus, vecCol, centFrame, "cid", "cv", "cell")
      .withColumn("vshard",
        floor(col("cell") * nShards / lit(nC)).cast("long"))
    // id bloom: [[append]] must find an id's CURRENT shard to handle
    // re-embedded vectors (the cell — hence shard — of an id can
    // change), and cell clustering means id ranges span every shard,
    // so min/max stats can never answer "where does this id live"
    graft.sinks.Sinks.writeShards(assigned, root, idCol, nShards,
      zoneCols = Seq("cell"), shardCol = Some("vshard"),
      bloomCols = Seq(idCol))
    // side table AFTER the layout commit: a crash between the two
    // leaves a layout without centroids — topK fails loudly on the
    // missing path instead of searching with a stale model
    centFrame.select(col("cid").cast("long"), col("cv").cast("array<double>"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
  }

  /** INCREMENTAL index maintenance: upsert a batch of vectors into a
    * [[publish]]ed index, rewriting ONLY the shards their cells map
    * to ([[graft.sinks.Sinks.mergeRows]] — untouched shards carry
    * forward as hard links with identical manifest rows). New ids
    * insert, existing ids replace (a re-embedded document moves to
    * its new cell's shard and vanishes from its old one — ONE merge
    * generation, the patch carrying a delete row at the old shard
    * beside the upsert at the new, so the move is atomic under the
    * publish crash envelope). The centroid set is FIXED at publish
    * time — the IVF contract: appends assign against the same coarse
    * quantizer, so recall drifts only as the data distribution does;
    * re-train + re-publish when it has (the SemDeDup k≈√n law says
    * when). At 100 TB an append of B vectors touching C cells costs
    * ~C/nCells of the corpus in rewrites, not a corpus scan. */
  def append(newRows: DataFrame, root: String, idCol: String,
             vecCol: String, retainPrevious: Boolean = false): Unit = {
    val spark = newRows.sparkSession
    val cents = graft.sinks.Sinks.readMemo(spark, s"$root/centroids")
    val nC = cents.count()
    val live = graft.sinks.Sinks.shardStats(spark, root)
    val nShards = live.select(max(col("spec_n"))).collect().head.getInt(0)
    val assigned = Similarity
      .assignCellsFrame(newRows, vecCol, cents, "cid", "cv", "cell")
      .withColumn("vshard",
        floor(col("cell") * nShards / lit(nC)).cast("long"))
      // the merge door evaluates its patch more than once (shard
      // detection, uniqueness gate, rewrite) — pin the assignment
      .localCheckpoint()
    // RE-EMBEDDED ids move cells — their OLD row lives in a shard the
    // upsert alone would never touch (merge replaces within the
    // patch's TARGET shards). Find current locations through the id
    // bloom (candidate shards only — cell clustering spreads id
    // ranges over every shard, so blooms are the stat that answers
    // this), and fold the old-shard DELETE rows into the SAME merge
    // as the upserts: one generation moves the id atomically — a
    // crash can never strand it deleted-but-not-reinserted, and the
    // old shard's rewrite is not paid twice.
    val ids = assigned.select(col(idCol).cast("string"))
      .collect().map(_.getString(0)).toSeq // bounded: the append batch
    val cand = candidateShards(spark, root, idCol, ids, live)
    val del = "_graft_move_delete"
    val patch =
      if (cand.isEmpty) assigned.withColumn(del, lit(false))
      else {
        val dataDir = s"$root/data"
        val liveRows = spark.read.option("basePath", dataDir)
          .parquet(cand.map(s => s"$dataDir/shard=$s"): _*)
          .drop("shard")
          .join(broadcast(assigned
            .select(col(idCol), col("vshard").as("_new_vshard"))),
            Seq(idCol))
        val moved = liveRows.filter(col("vshard") =!= col("_new_vshard"))
          .drop("_new_vshard")
          .localCheckpoint() // pin: the merge evaluates its patch twice+
        moved.withColumn(del, lit(true))
          .unionByName(assigned.withColumn(del, lit(false)))
      }
    graft.sinks.Sinks.mergeRows(spark, root, patch, idCol,
      deleteWhen = Some(col(del)), retainPrevious = retainPrevious)
    ()
  }

  /** TAKEDOWN on the vector store: remove `ids` from a [[publish]]ed
    * index in ONE generation, touching only the shards the id bloom
    * says might hold them — the opt-out/right-to-erasure door
    * ([[graft.sinks.Sinks.mergeRows]]'s delete semantics applied
    * through the same bloom routing [[append]] uses to find moved
    * rows). Cell clustering spreads id ranges over every shard, so
    * min/max zones can never answer "where does this id live"; the
    * bloom can, one-sidedly: false positives open an extra shard
    * whose anti-join then removes nothing, false negatives cannot
    * happen. Ids absent from the index are no-ops (SQL MERGE's
    * unmatched DELETE). At 100 TB a takedown of B ids costs the
    * shards that hold them, never a corpus scan. */
  def delete(spark: SparkSession, root: String, idCol: String,
             ids: Seq[String], retainPrevious: Boolean = false): Unit = {
    if (ids.isEmpty) return
    // bounded-planning envelope (the readShardsIn stance): the bloom
    // probe is ids × shards on the driver and the filter is a literal
    // IN — a corpus-scale erasure is a PREDICATE takedown
    // (Sinks.deleteWhere), not an id list
    require(ids.length <= 10000,
      s"delete takes a bounded id list (<= 10000, got ${ids.length}); " +
        "for larger erasures use Sinks.deleteWhere with a predicate")
    val live = graft.sinks.Sinks.shardStats(spark, root)
    val cand = candidateShards(spark, root, idCol, ids, live)
    if (cand.isEmpty) return // bloom proved absence everywhere
    val dataDir = s"$root/data"
    val victims = spark.read.option("basePath", dataDir)
      .parquet(cand.map(s => s"$dataDir/shard=$s"): _*)
      .drop("shard")
      .filter(col(idCol).cast("string").isin(ids: _*))
      .localCheckpoint() // pin: the merge evaluates its patch twice+
    if (victims.isEmpty) return // all-false-positive probe: no-op
    graft.sinks.Sinks.mergeRows(spark, root, victims, idCol,
      deleteWhen = Some(lit(true)), retainPrevious = retainPrevious)
    ()
  }

  /** STREAMING index maintenance: keep a [[publish]]ed index current
    * as vectors arrive — each micro-batch [[append]]s (cells assigned
    * collect-free, only the batch's shards rewritten, re-embedded ids
    * moved). `foreachBatch` is at-least-once: a replayed batch
    * re-upserts the same rows, which is EFFECT-idempotent (the final
    * corpus is identical; the cost is one redundant generation), so
    * the door needs no external dedup ledger. Ids must be unique
    * WITHIN a micro-batch ([[graft.sinks.Sinks.mergeRows]]'s loud
    * gate); a source that can repeat an id inside one batch must
    * collapse it upstream, where the "which version wins" rule
    * lives. The index must be [[publish]]ed before the stream starts
    * (centroids are the fixed coarse quantizer appends assign
    * against). */
  def stream(spark: SparkSession, vectors: DataFrame, root: String,
             idCol: String, vecCol: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
          val b = batch.toDF()
          if (!b.isEmpty) append(b, root, idCol, vecCol)
          ()
      }
      .start()

  /** SEMANTIC DEDUP over a [[publish]]ed index — the storage layout's
    * second job: the per-row cell assignment the publish recorded
    * powers SemDeDup's within-cell pair scoring directly, so the most
    * expensive dedup stage (assignment — one projection over the
    * whole corpus per run) is paid ONCE at publish time and every
    * dedup run starts from storage. Output and semantics are exactly
    * [[Dedup.semanticDedupFrame]] with the index's centroid set
    * (spec-pinned): survivors keep the lowest id of each near-
    * duplicate group at cosine ≥ `threshold`. */
  def semanticDedup(spark: SparkSession, root: String, idCol: String,
                    vecCol: String, threshold: Double = 0.95): DataFrame = {
    val corpus = graft.sinks.Sinks.readMemo(spark, s"$root/data")
    val centDf = graft.sinks.Sinks.readMemo(spark, s"$root/centroids")
      .select(col("cid").cast("long").as("cell"),
        col("cv").cast("array<double>").as("centv"))
    Dedup.semanticDedupCore(corpus, vecCol, idCol, "cell", spark,
      centDf, threshold)
  }

  /** Shards that might hold any of `ids`, from the manifest's id
    * bloom (one probe per (shard, id) on the driver — bounded by the
    * append batch × shard count). A missing/NULL bloom keeps the
    * shard conservatively, like every one-sided stat here. */
  private def candidateShards(spark: SparkSession, root: String,
                              idCol: String, ids: Seq[String],
                              live: DataFrame): Seq[Long] = {
    if (ids.isEmpty) return Nil
    if (!live.columns.contains(s"zbloom_$idCol"))
      return live.select(col("shard")).collect().map(_.getLong(0)).sorted.toSeq
    live.select(col("shard"), col(s"zbloom_$idCol"), col(s"zbloomk_$idCol"))
      .collect().toSeq
      .filter(r => r.isNullAt(1) || r.isNullAt(2) ||
        ids.exists(v => graft.expressions.BloomOps.containsMaybe(
          r.getSeq[Long](1).toArray, r.getInt(2), v)))
      .map(_.getLong(0)).sorted
  }

  /** Cell-routed approximate top-k over a [[publish]]ed layout.
    * `queries` has (idCol, vecCol); the batch is small by construction
    * (a search API call), so the probe-cell collect is bounded by
    * |queries|·nProbe, never the corpus. Returns the
    * (query_id, rank, corpus_id, score) shape of every search door. */
  def topK(spark: SparkSession, root: String, queries: DataFrame,
           idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val cents = graft.sinks.Sinks.readMemo(spark, s"$root/centroids")
    val packed = cents
      .select(struct(col("cid").as("cid"), col("cv").as("cv")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("_ac_cents"))
    val routed = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .crossJoin(broadcast(packed))
      .withColumn("cell", explode(slice(
        CentroidOps.nearestCentroidsCol(col("qv"), col("_ac_cents"),
          assumeConstant = true), 1, nProbe)))
      .drop("_ac_cents")
    val cells = routed.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val corpus = graft.sinks.Sinks.readShardsIn(spark, root, "cell", cells)
    // join on cell: a corpus row lives in ONE cell, so each
    // (query, corpus) pair scores at most once — no dedup needed
    val scored = corpus
      .select(col("cell"), col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("c_norm", Vectors.norm(col("cv")))
      .join(broadcast(routed.withColumn("q_norm", Vectors.norm(col("qv")))),
        Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        Vectors.cosineWithNorms(Vectors.dot(col("cv"), col("qv")),
          col("c_norm"), col("q_norm")).as("score"))
    Similarity.topK(scored, k)
  }
}
