package graft.operators

import graft.SparkTestBase
import graft.expressions.TextSignatures
import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall floors for the hash-seeded ops that have no value oracle
  * (q11/q15/q16/q23/q24): ground truth is computed exactly (all-pairs
  * Jaccard / cosine, brute-force top-k) on the sf0.001 block — tiny
  * enough for O(n²) truth, real enough to carry the planted near-dup
  * structure. Every operator here is seed-deterministic, so the
  * measured recalls are exact reproducible numbers, and the floors are
  * set a few points below them as regression tripwires, not
  * statistical hopes. */
class RecallSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = graft.Tables(spark, sf).documents
  private lazy val emb = graft.Tables(spark, sf).embeddings

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  private def recall(got: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
    if (truth.isEmpty) 1.0 else got.intersect(truth).size.toDouble / truth.size

  /** Exact all-pairs 3-gram Jaccard ≥ `minJ` — the quantity minhash
    * estimates. */
  private lazy val jaccardTruth: Map[Double, Set[(Long, Long)]] = {
    val sh = docs.select(col("doc_id").as("id"),
      array_distinct(TextSignatures.shingles(col("text"), 3)).as("sh"))
    val all = sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("j"))
      .filter(col("j") >= 0.5)
      .select("id_a", "id_b", "j").as[(Long, Long, Double)].collect()
    Map(0.5 -> all.filter(_._3 >= 0.5).map(t => (t._1, t._2)).toSet,
        0.7 -> all.filter(_._3 >= 0.7).map(t => (t._1, t._2)).toSet)
  }

  test("q11: minhash LSH recall vs exact Jaccard truth") {
    val got = pairSet(Dedup.minHashLsh(docs, "text", "doc_id",
      estThreshold = 0.35))
    val r50 = recall(got, jaccardTruth(0.5))
    val r70 = recall(got, jaccardTruth(0.7))
    info(s"minhash recall: J>=0.5 -> $r50 (n=${jaccardTruth(0.5).size}), " +
      s"J>=0.7 -> $r70 (n=${jaccardTruth(0.7).size})")
    assert(jaccardTruth(0.5).nonEmpty, "test corpus must contain near-dups")
    assert(r70 >= 0.90, s"recall of strong near-dups (J>=0.7) was $r70")
    assert(r50 >= 0.75, s"recall of borderline near-dups (J>=0.5) was $r50")
  }

  /** Planted near-duplicates: deterministic noisy copies of the first
    * `n` corpus vectors at cosine ≈ `targetCos` (the sf0.001 embeddings
    * are random — max natural pairwise cosine 0.48 — so near-dup truth
    * must be planted; seeded noise keeps the whole experiment
    * reproducible). Returns (plantedDf with ids shifted +100000, exact
    * per-pair cosines). */
  private def planted(n: Int, targetCos: Double): (DataFrame, Map[(Long, Long), Double]) = {
    val eps = math.sqrt(1.0 / (targetCos * targetCos) - 1.0)
    val base = emb.filter(col("vec_id") < n)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    val rnd = new scala.util.Random(7)
    val rows = base.map { case (id, v) =>
      val vd = v.map(_.toDouble)
      val nrm = math.sqrt(vd.map(x => x * x).sum)
      val noise = vd.map(_ => rnd.nextGaussian())
      val nNorm = math.sqrt(noise.map(x => x * x).sum)
      val scaled = noise.map(_ / nNorm * eps * nrm)
      (id + 100000L, vd.zip(scaled).map { case (x, d) => (x + d).toFloat })
    }
    val exact = base.zip(rows).map { case ((id, v), (pid, p)) =>
      val vd = v.map(_.toDouble); val pd = p.map(_.toDouble)
      val dot = vd.zip(pd).map { case (x, y) => x * y }.sum
      val c = dot / (math.sqrt(vd.map(x => x * x).sum) * math.sqrt(pd.map(x => x * x).sum))
      (id, pid) -> c
    }.toMap
    (rows.toSeq.toDF("vec_id", "embedding"), exact)
  }

  test("q16: banded near-dup recall on planted cos>=0.95 pairs") {
    val (plant, exact) = planted(40, targetCos = 0.97)
    val truth = exact.filter(_._2 >= 0.95).keySet
    assert(truth.size >= 30, s"planting produced only ${truth.size} pairs >= 0.95")
    val corpus = emb.select("vec_id", "embedding").unionByName(plant)
    val got = pairSet(Dedup.embeddingNearDup(corpus, "embedding", "vec_id",
      threshold = 0.95))
    val r = recall(got, truth)
    info(s"banded near-dup recall (3 bands x 8 planes): $r (n=${truth.size})")
    assert(r >= 0.75, s"banded sign-RP recall was $r")
    // precision is exact by construction: every emitted pair passed the
    // exact cosine filter — nothing below threshold can appear
    assert(got.forall { case (a, b) =>
      exact.get((a, b)).forall(_ >= 0.95 - 1e-9) })
  }

  private def topkPairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet

  test("q15: LSH ANN finds planted true neighbors; multi-probe beats single") {
    // queries = planted noisy copies; each query's true nearest
    // neighbor is its source vector (cos ~0.97 vs <=0.48 ambient)
    val (qs, exact) = planted(20, targetCos = 0.97)
    val truth = exact.keySet.map { case (src, q) => (q, src) } // (query_id, corpus_id)
    def hits(probeBits: Int): Double = recall(
      topkPairs(Similarity.lshTopK(emb, qs, "embedding", "vec_id", 5,
        planes = 8, probeBits = probeBits)), truth)
    val single = hits(0)
    val multi = hits(1)
    info(s"planted-neighbor recall@5 at planes=8: single-probe $single, multi-probe $multi")
    assert(multi >= single, "multi-probe must never lose recall")
    assert(multi >= 0.85, s"multi-probe recall of planted neighbors was $multi")
  }

  test("q23: IVF ANN recall@5 with trained centroids vs brute force") {
    val qs = emb.filter(col("vec_id") < 20)
    val truth = topkPairs(Similarity.bruteForceTopK(emb, qs, "embedding", "vec_id", 5))
    val km = Similarity.kmeansCentroids(emb, "embedding", k = 8, iters = 3)
    val got = topkPairs(Similarity.ivfTopK(emb, qs, "embedding", "vec_id", 5,
      nCentroids = 8, nProbe = 3, centroids = Some(km)))
    val r = recall(got, truth)
    info(s"IVF ANN recall@5 at k=8/nProbe=3: $r (n=${truth.size})")
    assert(r >= 0.50, s"IVF recall@5 was $r")
  }

  test("incremental embedding dedup: batch-vs-corpus recall on planted pairs") {
    // The streaming twin of q16 (IncrementalDedup.processEmbeddingBatch)
    // must find the same planted near-dups when they arrive in a LATER
    // batch than their sources — same floor as the batch path, because
    // the blocking (banded sign-RP, 3x8) is identical and the probe
    // joins new bands against the persisted store.
    val (plant, exact) = planted(40, targetCos = 0.97)
    val truth = exact.filter(_._2 >= 0.95).keySet // (corpus src, planted copy)
    assert(truth.size >= 30, s"planting produced only ${truth.size} pairs >= 0.95")
    val w = java.nio.file.Files.createTempDirectory("graft_increcall_").toString
    // batch 1 seeds the corpus store; batch 2 delivers the near-dups
    graft.streaming.IncrementalDedup.processEmbeddingBatch(spark,
      emb.select("vec_id", "embedding"), s"$w/store", s"$w/pairs",
      "embedding", "vec_id", planes = 8, bands = 3, threshold = 0.95)
    graft.streaming.IncrementalDedup.processEmbeddingBatch(spark,
      plant, s"$w/store", s"$w/pairs",
      "embedding", "vec_id", planes = 8, bands = 3, threshold = 0.95)
    val cross = spark.read.parquet(s"$w/pairs")
      .select("corpus_id", "new_id").as[(Long, Long)].collect().toSet
      .filter(p => p._1 < 100000L && p._2 >= 100000L) // new-vs-corpus only
    val r = recall(cross, truth)
    info(s"incremental embedding recall (3 bands x 8 planes): $r (n=${truth.size})")
    assert(r >= 0.75, s"incremental batch-vs-corpus recall was $r")
    // precision: a planted copy may only pair with its own source — the
    // ambient corpus tops out at cos 0.48, far under the 0.95 gate
    assert(cross.subsetOf(truth),
      s"false cross-batch pairs: ${cross.diff(truth).take(3)}")
  }

  test("q66: semantic dedup collapses planted near-dups under kmeans cells") {
    // The production configuration (seeded kmeansCentroids, so
    // rows-only in the catalog): recall loss can only come from a
    // planted pair straddling a cell boundary — within-cell scoring is
    // exact all-pairs. Near-identical vectors have near-identical
    // centroid distances, so straddles are rare by construction.
    val (plant, exact) = planted(40, targetCos = 0.97)
    val truth = exact.filter(_._2 >= 0.95).keySet
    assert(truth.size >= 30, s"planting produced only ${truth.size} pairs >= 0.95")
    val corpus = emb.select("vec_id", "embedding").unionByName(plant)
    val km = Similarity.kmeansCentroids(corpus, "embedding", k = 8, iters = 3)
    val out = Dedup.semanticDedup(corpus, "embedding", "vec_id", spark,
      km, threshold = 0.95)
    val surv = out.select("vec_id", "survivor_id").as[(Long, Long)].collect().toMap
    // every corpus row maps somewhere, exactly once
    assert(surv.size == corpus.count())
    val collapsed = truth.count { case (src, copy) => surv(src) == surv(copy) }
    val r = collapsed.toDouble / truth.size
    info(s"semantic dedup same-survivor recall at k=8 cells: $r (n=${truth.size})")
    assert(r >= 0.80, s"semantic dedup recall was $r")
    // pruning direction: of each collapsed pair, the survivor is one of
    // the pair (ambient corpus tops out at cos 0.48, so no third member)
    truth.foreach { case (src, copy) =>
      if (surv(src) == surv(copy))
        assert(Set(src, copy).contains(surv(src)),
          s"survivor ${surv(src)} outside pair ($src,$copy)")
    }
  }

  test("pre-assigned semantic dedup equals the in-query-assignment path") {
    // the deploy shape: assignCells at ingest, semanticDedupAssigned in
    // the query — must yield exactly the in-query path's verdicts
    val km = Similarity.kmeansCentroids(emb, "embedding", k = 8, iters = 3)
    val inQuery = Dedup.semanticDedup(emb, "embedding", "vec_id", spark,
      km, threshold = 0.35)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val assigned = Similarity.assignCells(
      emb.select("vec_id", "embedding"), "embedding", km)
    val pre = Dedup.semanticDedupAssigned(assigned, "embedding", "vec_id",
      "cell", spark, km, threshold = 0.35)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(pre == inQuery)
    assert(pre.nonEmpty)
  }

  test("srpParams: fixture scales keep (8,3); big corpora bound buckets and hold recall") {
    // every verify/bench scale (n <= 16384) lands on the historical
    // parameters, so recall measurements and rows-only outputs stand
    Seq(600L, 6000L, 16384L).foreach { n =>
      assert(Dedup.srpParams(n) == (8, 3), s"n=$n")
    }
    // beyond: planes bounds the expected bucket near targetBucket, and
    // bands holds the analytic recall floor for cos>=0.95 near-dups
    Seq(60000L, 600000L, 60000000L).foreach { n =>
      val (planes, bands) = Dedup.srpParams(n)
      val bucket = n.toDouble / math.pow(2.0, planes)
      assert(bucket <= 64.0 + 1e-9, s"n=$n: expected bucket $bucket > 64")
      val recall = 1.0 - math.pow(1.0 - math.pow(0.9, planes), bands)
      assert(recall >= 0.75, s"n=$n: analytic recall $recall < 0.75")
      // the candidate budget stays linear: bands grows only log-ishly
      assert(bands <= 16, s"n=$n: bands $bands")
    }
  }

  test("frame-based semantic dedup equals the literal-centroid path, with no driver collect") {
    // the 100 TB shape (round-12 fix): centroids stay a DataFrame end
    // to end — assignment via the broadcast pack, survivor selection
    // via the broadcast join — and must yield exactly the literal
    // path's verdicts
    val km = Similarity.kmeansCentroids(emb, "embedding", k = 8, iters = 3)
    val literal = Dedup.semanticDedup(emb, "embedding", "vec_id", spark,
      km, threshold = 0.35)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val centFrame = spark.createDataFrame(
        km._1.zip(km._2).map { case (i, v) => (i, v.toSeq) }.toSeq)
      .toDF("cid", "cv")
    val framed = Dedup.semanticDedupFrame(emb, "embedding", "vec_id", spark,
      centFrame, "cid", "cv", threshold = 0.35)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(framed == literal)
    assert(framed.nonEmpty)
  }

  test("assignCellsFrame matches assignCells and broadcasts the pack") {
    val km = Similarity.kmeansCentroids(emb, "embedding", k = 8, iters = 3)
    val lit = Similarity.assignCells(
      emb.select("vec_id", "embedding"), "embedding", km)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val centFrame = spark.createDataFrame(
        km._1.zip(km._2).map { case (i, v) => (i, v.toSeq) }.toSeq)
      .toDF("cid", "cv")
    val framed = Similarity.assignCellsFrame(
      emb.select("vec_id", "embedding"), "embedding", centFrame, "cid", "cv")
    val plan = framed.queryExecution.executedPlan.toString
    // the pack must ride a broadcast exchange (executor-side), and the
    // corpus side must not shuffle for the assignment
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast pack:\n$plan")
    val got = framed.select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(got == lit)
  }

  test("literal centroid budget: oversize sets fail loudly toward the frame path") {
    val dim = 1 << 16
    val huge = Array.tabulate(65)(i => new Array[Double](dim)) // 65*65536 > 2^22
    val ids = Array.tabulate(65)(_.toLong)
    val e = intercept[IllegalArgumentException] {
      graft.expressions.CentroidOps.nearestCentroids(
        col("embedding"), ids, huge)
    }
    assert(e.getMessage.contains("assignCellsFrame"))
  }

  test("q67: quantized two-stage ANN recall@5 vs exact brute force") {
    val qs = emb.filter(col("vec_id") < 20)
    val truth = topkPairs(Similarity.bruteForceTopK(emb, qs, "embedding", "vec_id", 5))
    val got = topkPairs(Similarity.quantizedTopK(emb, qs, "embedding", "vec_id", 5))
    val r = recall(got, truth)
    info(s"int8 two-stage recall@5 at candFactor=4: $r (n=${truth.size})")
    assert(r >= 0.90, s"quantized ANN recall@5 was $r")
  }

  test("q24: cluster recall — truth-pair mates land in one cluster") {
    val truth = jaccardTruth(0.7)
    assert(truth.nonEmpty)
    val pairs = Dedup.minHashLsh(docs, "text", "doc_id", estThreshold = 0.35)
    val clusters = Dedup.clusterDuplicates(pairs, spark)
      .as[(Long, Long)].collect().toMap
    val together = truth.count { case (a, b) =>
      clusters.get(a).exists(ca => clusters.get(b).contains(ca))
    }
    val r = together.toDouble / truth.size
    info(s"cluster recall on J>=0.7 truth pairs: $r (n=${truth.size})")
    assert(r >= 0.90, s"cluster recall was $r")
  }
}
