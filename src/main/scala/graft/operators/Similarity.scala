package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge
import graft.expressions.TopKByScoreAgg
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column
  * (builder brief extension).
  *
  * Baseline: brute-force cosine top-k — the query set is broadcast (it
  * is small by construction), the corpus streams through one codegen'd
  * projection per (query, vector) pair, and a bounded-heap top-k
  * aggregate keeps only k rows per query. Corpus-side norms are
  * computed once per row, not per pair.
  *
  * Scale path: sign-random-projection LSH bucketing — corpus hashed once
  * into 2^p buckets; each query probes only its own bucket (plus
  * optional multi-probe neighbors), so the per-query cost drops from
  * O(N) to O(N / 2^p) at recall traded off by p.
  */
object Similarity {

  /** Column aggregate: the k best (id, score) structs by
    * (score desc, id asc), in rank order — the native
    * [[graft.expressions.TopKByScoreAgg]] bounded heap. The merge is
    * associative+commutative, so Spark runs map-side partial
    * aggregation: each map task carries at most k entries per query
    * through the shuffle, and no task ever sorts a corpus-sized
    * partition — this is what keeps "top-5 of 10⁸ corpus rows per
    * query" O(k) memory instead of a single-task full-partition sort
    * (the q43-shape anti-pattern the per-query `row_number` Window
    * tail had). */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByScoreAgg(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())

  /** Per-query top-k tail shared by all search variants: keep the k
    * best (score desc, corpus_id asc) per query via the bounded-heap
    * aggregate, then unnest with the array position as the rank.
    * Null scores (a null/empty vector upstream) are EXCLUDED: "no
    * similarity" is not a neighbor — the old window tail only ever
    * surfaced null-score rows when a query had fewer than k scorable
    * corpus rows. (The native aggregate also skips nulls itself; the
    * explicit filter keeps the contract visible in the plan.) */
  private[operators] def topK(scored: DataFrame, k: Int): DataFrame =
    // annScope: execute under the raised ObjectHashAggregate fallback
    // threshold (scoped session clone) so a task holding hundreds of
    // query groups stays in hash mode — see GraftSession.annScope.
    graft.GraftSession.annScope(scored.filter(col("score").isNotNull)
      .groupBy(col("query_id"))
      .agg(topKByScore(col("score"), col("corpus_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("corpus_id"), col("col.score").as("score")))

  /** Row array → double[] regardless of the column's numeric element
    * type (array<float> and array<double> are both supported across
    * the vector API; a bare getSeq[Float] would ClassCastException on
    * doubles). */
  private def vecAt(r: org.apache.spark.sql.Row, i: Int): Array[Double] =
    r.getSeq[Any](i).map(_.asInstanceOf[Number].doubleValue).toArray

  /** Brute-force exact top-k by cosine. `queries` and `corpus` both have
    * (idCol, vecCol); ties broken by corpus id ascending. Self-matches
    * (same id) are excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                     idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("c_norm", Vectors.norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("q_norm", Vectors.norm(col("qv")))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        Vectors.cosineWithNorms(Vectors.dot(col("cv"), col("qv")),
          col("c_norm"), col("q_norm")).as("score"))
    topK(scored, k)
  }

  /** IVF (inverted-file) approximate top-k: the corpus is assigned to
    * its nearest of `nCentroids` coarse centroids once (a broadcast
    * argmin, no shuffle of the corpus), and each query searches only its
    * `nProbe` nearest cells. Per-query cost drops from O(N) to
    * ~O(N * nProbe / nCentroids); recall is tunable via nProbe.
    *
    * Centroids here are a deterministic id-hash sample of the corpus —
    * at lake scale swap for k-means centroids computed offline; the
    * search plan is unchanged. */
  /** Offline k-means (Lloyd's) for IVF coarse centroids, pure DataFrame
    * ops: init = deterministic id-hash sample; each iteration assigns
    * via the native `NearestCentroids` expression (one projection over
    * the corpus) and recomputes means with a posexplode + two-level
    * aggregate (C×dim rows — tiny). `iters` small (3-5) suffices for a
    * coarse quantizer. Returns (ids 0..k-1, centroid vectors). */
  /** Ingest-time cell assignment: append the nearest-centroid id as a
    * column — computed ONCE per generation so downstream consumers
    * ([[Dedup.semanticDedupAssigned]], IVF probing) never pay the
    * O(n·k·dim) assignment inside a query. One native projection, no
    * shuffle; write the result alongside the embedding table. */
  def assignCells(df: DataFrame, vecCol: String,
                  centroids: (Array[Long], Array[Array[Double]]),
                  cellCol: String = "cell"): DataFrame =
    df.withColumn(cellCol, element_at(
      graft.expressions.CentroidOps.nearestCentroids(
        col(vecCol), centroids._1, centroids._2), 1))

  /** [[assignCells]] with the centroid set as a DATAFRAME — the
    * lake-scale form, and the fix for the one driver-memory scale
    * point the literal path has: nothing is ever `collect()`ed. The
    * centroid frame is packed into ONE row on the executors
    * (`sort_array(collect_list(struct(cid, cv)))` — sorted so the
    * pack is deterministic regardless of partition order), broadcast,
    * and cross-joined onto the corpus (the q26 1-row-frame pattern),
    * where the native [[graft.expressions.NearestCentroidsCol]]
    * projection assigns each vector. Zero corpus shuffle; the k·dim
    * payload rides Spark's broadcast machinery with its own loud
    * size limits instead of silently growing the driver heap.
    * Assignment order/tie-breaks are identical to [[assignCells]]
    * (spec-pinned). */
  def assignCellsFrame(df: DataFrame, vecCol: String, centroids: DataFrame,
                       centIdCol: String, centVecCol: String,
                       cellCol: String = "cell"): DataFrame = {
    val packed = centroids
      .select(struct(col(centIdCol).cast("long").as("cid"),
        col(centVecCol).cast("array<double>").as("cv")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("_ac_cents"))
    df.crossJoin(broadcast(packed))
      .withColumn(cellCol, element_at(
        graft.expressions.CentroidOps.nearestCentroidsCol(
          col(vecCol), col("_ac_cents"), assumeConstant = true), 1))
      .drop("_ac_cents")
  }

  def kmeansCentroids(corpus: DataFrame, vecCol: String, k: Int,
                      iters: Int = 3): (Array[Long], Array[Array[Double]]) = {
    // full-hash secondary sort: the 1e6-bucket key alone ties for
    // duplicate vectors (and collides at modest corpus sizes), making
    // seed selection partition-order-dependent; ties on the full hash
    // are identical vectors, so either pick yields the same centroid
    val seeded = corpus
      .select(col(vecCol).as("v"),
        pmod(xxhash64(col(vecCol)), lit(1000000)).as("_r"),
        xxhash64(col(vecCol)).as("_h"))
      .orderBy(col("_r"), col("_h")).limit(k)
      .collect().map(vecAt(_, 0))
    // training collects k seeds + k·dim mean rows per iteration on the
    // driver — hold it to the same literal/driver budget as plan-time
    // centroid inlining; beyond it, train coarse quantizers with a
    // distributed library and feed assignCellsFrame the result
    require(seeded.iterator.map(_.length.toLong).sum <=
        graft.expressions.CentroidOps.MaxLiteralCentroidDoubles,
      s"k=$k x dim=${seeded.headOption.fold(0)(_.length)} exceeds the " +
        "driver-side training budget " +
        s"(${graft.expressions.CentroidOps.MaxLiteralCentroidDoubles} " +
        "doubles); use externally-trained centroids with assignCellsFrame")
    var cents = seeded
    // corpus smaller than k: fewer centroids, never out-of-range ids
    val ids = Array.tabulate(math.min(k, seeded.length))(_.toLong)
    for (_ <- 1 to iters) {
      val assigned = corpus.select(col(vecCol).as("v"))
        .withColumn("c", element_at(
          graft.expressions.CentroidOps.nearestCentroids(col("v"), ids, cents), 1))
      val means = assigned
        .select(col("c"), posexplode(col("v")))
        .groupBy(col("c"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val byC = means.groupBy(_.getLong(0))
      cents = ids.map { cid =>
        byC.get(cid) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val v = new Array[Double](dim)
            rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
            v
          case None => cents(cid.toInt) // empty cell keeps its centroid
        }
      }
    }
    (ids, cents)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int, nCentroids: Int = 16,
              nProbe: Int = 4,
              centroids: Option[(Array[Long], Array[Array[Double]])] = None): DataFrame = {
    // centroids are a model parameter (here: deterministic id-hash
    // sample; offline k-means at lake scale) — collected once at plan
    // build, tiny (nCentroids × dim floats), inlined as literals so the
    // corpus assignment is ONE projection: no cross join, no window, no
    // shuffle of the corpus.
    val (centIds, centVecs) = centroids.getOrElse {
      val centRows = corpus
        .select(col(idCol).cast("long").as("centroid_id"), col(vecCol).as("centv"))
        .withColumn("_r", pmod(xxhash64(col("centroid_id")), lit(1000000)))
        .orderBy(col("_r"), col("centroid_id")).limit(nCentroids)
        .select("centroid_id", "centv")
        .collect()
      (centRows.map(_.getLong(0)), centRows.map(vecAt(_, 1)))
    }
    def cells(v: Column): Column =
      graft.expressions.CentroidOps.nearestCentroids(v, centIds, centVecs)

    val assigned = corpus
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("centroid_id", element_at(cells(col("cv")), 1))
      .withColumn("c_norm", Vectors.norm(col("cv")))

    // queries probe their nProbe nearest cells (query side is small)
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("centroid_id", explode(slice(cells(col("qv")), 1, nProbe)))
      .withColumn("q_norm", Vectors.norm(col("qv")))

    val scored = assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        Vectors.cosineWithNorms(Vectors.dot(col("cv"), col("qv")),
          col("c_norm"), col("q_norm")).as("score"))
    topK(scored, k)
  }

  /** LSH-bucketed approximate top-k: compare only within the query's
    * sign-random-projection bucket, plus — with `probeBits = 1`
    * (default) — the `planes` buckets at hamming distance 1
    * (multi-probe LSH). A near neighbor that disagrees with the query
    * on exactly one hyperplane lands one bit-flip away, and a single
    * disagreeing plane is the MOST likely miss for a close pair, so
    * probing those buckets recovers most of the recall a single-bucket
    * probe loses (measured on planted cos≈0.97 neighbors at planes=8:
    * 0.50 single-probe → 0.95 multi-probe, RecallSpec).
    *
    * Scale shape is unchanged: the corpus is hashed ONCE (no extra
    * corpus pass, no reshuffle); only the tiny broadcast query side
    * explodes to `planes + 1` probe rows, so per-query cost is
    * O(N · (planes+1) / 2^planes). `probeBits = 0` restores the exact
    * single-bucket probe. */
  /** Int8-quantized two-stage top-k: score ALL pairs with the
    * quantized dot (4× fewer bytes through the scan/broadcast than
    * float32 — at lake scale the corpus stores `quantizeInt8(v)` and
    * never reads the float column in stage 1), keep the top
    * `k·candFactor` candidates per query, then re-rank just those with
    * the exact cosine. Approximation error only matters near the k-th
    * boundary, so a small candFactor recovers recall (RecallSpec floors
    * it against [[bruteForceTopK]]); the stage-1 score normalizes the
    * quantized dot by the exact norms so varying corpus magnitudes
    * don't distort the candidate ranking. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                    idCol: String, k: Int, candFactor: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      Vectors.quantizeInt8(col(vecCol)).as("cq"),
      Vectors.norm(col(vecCol)).as("c_norm"))
    val q = queries.select(col(idCol).as("query_id"),
      Vectors.quantizeInt8(col(vecCol)).as("qq"),
      Vectors.norm(col(vecCol)).as("q_norm"))
    val cands = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        Vectors.cosineWithNorms(Vectors.dotQuantized(col("cq"), col("qq")),
          col("c_norm"), col("q_norm")).as("ascore"))
      .filter(col("ascore").isNotNull) // null = unscorable, never a candidate
      .groupBy(col("query_id"))
      .agg(topKByScore(col("ascore"), col("corpus_id"), k * candFactor).as("tk"))
      .select(col("query_id"), explode(col("tk.id")).as("corpus_id"))
    // exact re-rank of the surviving k·candFactor ids only
    val cv = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      Vectors.norm(col(vecCol)).as("c_norm"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      Vectors.norm(col(vecCol)).as("q_norm"))
    val scored = cands.join(cv, Seq("corpus_id")).join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("corpus_id"),
        Vectors.cosineWithNorms(Vectors.dot(col("cv"), col("qv")),
          col("c_norm"), col("q_norm")).as("score"))
    topK(scored, k)
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int, planes: Int = 8,
              probeBits: Int = 1): DataFrame = {
    require(probeBits >= 0 && probeBits <= 2,
      s"probeBits 0 (exact bucket), 1 (hamming-1 multi-probe) or 2 " +
        s"(hamming-2); got $probeBits")
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("bucket", Vectors.rpBucket(col("cv"), planes))
      .withColumn("c_norm", Vectors.norm(col("cv")))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("_b0", Vectors.rpBucket(col("qv"), planes))
      .withColumn("q_norm", Vectors.norm(col("qv")))
    // a corpus row has ONE bucket and the probe buckets are distinct,
    // so each (query, corpus) pair matches at most once — no dedup.
    // probeBits = 2 adds the C(planes, 2) two-bit flips: the probe
    // list lives on the BROADCAST query side, so widening it scales
    // the scored candidates, not the corpus scan — recall at cos≈0.97
    // rises from ~P(hamming≤1) to ~P(hamming≤2) of the plane flips
    // (q15's floor headroom, round-17)
    val oneBit = (0 until planes).map(b => col("_b0").bitwiseXOR(lit(1L << b)))
    val twoBit = for {
      i <- 0 until planes; j <- i + 1 until planes
    } yield col("_b0").bitwiseXOR(lit((1L << i) | (1L << j)))
    val probes = probeBits match {
      case 0 => array(col("_b0"))
      case 1 => array(col("_b0") +: oneBit: _*)
      case _ => array((col("_b0") +: oneBit) ++ twoBit: _*)
    }
    val q = qBase.withColumn("bucket", explode(probes)).drop("_b0")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        Vectors.cosineWithNorms(Vectors.dot(col("cv"), col("qv")),
          col("c_norm"), col("q_norm")).as("score"))
    topK(scored, k)
  }
}
