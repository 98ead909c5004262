package graft.operators

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Storage-integrated IVF search: the cell-clustered publish, the
  * set-membership read door behind it, and the recall/exactness
  * contracts of cell-routed top-k. */
class VectorIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def embeddings = spark.read.parquet(s"$sf/embeddings.parquet")

  test("readShardsIn equals the plain IN filter and opens only " +
       "intersecting shards") {
    val t = Files.createTempDirectory("graft_vin_").toString + "/pub"
    val df = spark.range(300).toDF("id")
      .withColumn("bucket", (col("id") / 50).cast("long"))
      .withColumn("payload", concat(lit("p"), col("id")))
    graft.sinks.Sinks.writeShards(df, t, "id", nShards = 6,
      zoneCols = Seq("bucket"), shardCol = Some("bucket"))
    val vals = Seq(1L, 4L)
    val got = graft.sinks.Sinks.readShardsIn(spark, t, "bucket", vals)
    val want = spark.read.parquet(s"$t/data").filter(col("bucket").isin(vals: _*))
    assert(got.select("id").as[Long].collect().sorted.toSeq ==
      want.select("id").as[Long].collect().sorted.toSeq)
    // pruning: only the 2 matching shards' files are planned
    val all = spark.read.parquet(s"$t/data").inputFiles.length
    assert(got.inputFiles.length < all,
      s"expected pruning, opened ${got.inputFiles.length} of $all")
    // empty value set: zero rows, schema intact
    assert(graft.sinks.Sinks.readShardsIn(spark, t, "bucket", Nil).isEmpty)
    // no-intersection set: zero rows
    assert(graft.sinks.Sinks.readShardsIn(spark, t, "bucket", Seq(99L)).isEmpty)
    // oversized probe set refused loudly (the bounded-planning envelope)
    val big = intercept[IllegalArgumentException] {
      graft.sinks.Sinks.readShardsIn(spark, t, "bucket",
        (0L until 10001L).toSeq)
    }
    assert(big.getMessage.contains("bounded-planning"))
  }

  test("readShardsIn prunes on STRING and TIMESTAMP zone columns too") {
    val t = Files.createTempDirectory("graft_vin_").toString + "/pub"
    val df = spark.range(300).toDF("id")
      .withColumn("bucket", (col("id") / 100).cast("long"))
      .withColumn("day",
        date_format(expr("timestamp'2024-01-01' + make_interval(0,0,0,CAST(id/100 AS INT))"),
          "yyyy-MM-dd"))
      .withColumn("ts",
        expr("timestamp'2024-01-01' + make_interval(0,0,0,CAST(id/100 AS INT))"))
    graft.sinks.Sinks.writeShards(df, t, "id", nShards = 3,
      zoneCols = Seq("day", "ts"), shardCol = Some("bucket"))
    val all = spark.read.parquet(s"$t/data").inputFiles.length
    val byDay = graft.sinks.Sinks.readShardsIn(spark, t, "day",
      Seq("2024-01-02"))
    assert(byDay.select("id").as[Long].collect().sorted.toSeq ==
      (100L until 200L).toSeq)
    assert(byDay.inputFiles.length < all)
    val wantTs = java.sql.Timestamp.valueOf("2024-01-03 00:00:00")
    val byTs = graft.sinks.Sinks.readShardsIn(spark, t, "ts", Seq(wantTs))
    assert(byTs.select("id").as[Long].collect().sorted.toSeq ==
      (200L until 300L).toSeq)
    assert(byTs.inputFiles.length < all)
  }

  test("publish + topK: searches only probed cells' shards, scores " +
       "bit-equal to brute force on the returned pairs, recall holds") {
    val t = Files.createTempDirectory("graft_vix_").toString + "/idx"
    VectorIndex.publish(embeddings, t, "vec_id", "embedding",
      nCells = 16, nShards = 8)
    // centroid side table rides beside the layout
    val cents = spark.read.parquet(s"$t/centroids")
    assert(cents.count() == 16 && cents.columns.sameElements(Array("cid", "cv")))
    val queries = embeddings.filter(col("vec_id") < 10)
    val got = VectorIndex.topK(spark, t, queries, "vec_id", "embedding",
      k = 5, nProbe = 6)
    assert(got.groupBy("query_id").count().filter(col("count") > 5).isEmpty)
    val brute = Similarity.bruteForceTopK(embeddings, queries,
      "embedding", "vec_id", k = 5)
    // exactness inside the probe: every returned (query, corpus) pair
    // carries the same double cosine brute force computes
    val bruteScores = brute.select(col("query_id"), col("corpus_id"),
      col("score").as("b_score"))
    val joined = got.join(bruteScores, Seq("query_id", "corpus_id"), "left")
      .filter(col("b_score").isNotNull)
    assert(joined.filter(col("score") =!= col("b_score")).isEmpty,
      "IVF scores must be bit-identical to brute force on shared pairs")
    // recall vs exact top-5 at nProbe=6/16 on the fixture corpus —
    // floor chosen below the measured value with margin; QUALITY.json
    // tracks the exact number per round
    val truth = brute.select("query_id", "corpus_id")
      .as[(Long, Long)].collect().toSet
    val hits = got.select("query_id", "corpus_id")
      .as[(Long, Long)].collect().toSet
    val recall = hits.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.5, s"recall $recall below spec floor 0.5")
  }

  test("topK reads prune shards: a 1-probe search plans a strict " +
       "subset of the corpus files") {
    val t = Files.createTempDirectory("graft_vix_").toString + "/idx"
    VectorIndex.publish(embeddings, t, "vec_id", "embedding",
      nCells = 16, nShards = 8)
    val one = embeddings.filter(col("vec_id") === 0)
    // route the query exactly as topK does, then check the door's plan
    val cents = spark.read.parquet(s"$t/centroids")
    val packed = cents.select(struct(col("cid"), col("cv")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
    val cell = one.crossJoin(packed).select(element_at(
        graft.expressions.CentroidOps.nearestCentroidsCol(
          col("embedding").cast("array<double>"), col("cs")), 1))
      .as[Long].collect().head
    val pruned = graft.sinks.Sinks.readShardsIn(spark, t, "cell", Seq(cell))
    val all = spark.read.parquet(s"$t/data").inputFiles.length
    assert(pruned.inputFiles.length < all,
      s"1-cell probe should not plan all $all files")
  }

  test("append rewrites only the appended cells' shards; search finds " +
       "the new vectors; replaced ids move shards") {
    val t = Files.createTempDirectory("graft_vix_").toString + "/idx"
    val base = embeddings.filter(col("vec_id") < 400)
    VectorIndex.publish(base, t, "vec_id", "embedding",
      nCells = 16, nShards = 8)
    val before = spark.read.parquet(s"$t/manifest")
      .select("shard", "n_rows", "content_hash")
      .as[(Long, Long, Long)].collect()
      .map { case (s, n, h) => s -> (n, h) }.toMap
    // a SMALL batch (5 vectors -> at most 5 cells): the point of the
    // door is that rewrite cost scales with the batch's cells, so the
    // spec appends few vectors and asserts most shards carry forward
    val extra = embeddings.filter(col("vec_id") >= 400 && col("vec_id") < 405)
    VectorIndex.append(extra, t, "vec_id", "embedding")
    val after = spark.read.parquet(s"$t/manifest")
      .select("shard", "n_rows", "content_hash")
      .as[(Long, Long, Long)].collect()
      .map { case (s, n, h) => s -> (n, h) }.toMap
    // total membership = base + appended batch
    assert(after.values.map(_._1).sum == 405L)
    // untouched shards carry identical manifest rows (hard links)
    val untouched = before.keySet.intersect(after.keySet)
      .filter(s => before(s) == after(s))
    assert(untouched.nonEmpty,
      "an append of 5 vectors must not rewrite every shard")
    // the full index now answers searches over appended vectors
    val q = embeddings.filter(col("vec_id") === 402)
    val indexed = embeddings.filter(col("vec_id") < 400 ||
      (col("vec_id") >= 400 && col("vec_id") < 405))
    val got = VectorIndex.topK(spark, t, q, "vec_id", "embedding",
      k = 3, nProbe = 16)
    val brute = Similarity.bruteForceTopK(indexed, q,
      "embedding", "vec_id", k = 3)
    assert(got.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet ==
      brute.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet,
      "all-cell probe over the appended index must equal brute force")
    // replace: re-append an EXISTING id with a different vector — it
    // must appear exactly once, in its new cell's shard
    val moved = embeddings.filter(col("vec_id") === 10)
      .withColumn("embedding",
        transform(col("embedding"), x => -x))
    VectorIndex.append(moved, t, "vec_id", "embedding")
    val cnt = spark.read.parquet(s"$t/data")
      .filter(col("vec_id") === 10).count()
    assert(cnt == 1L, s"replaced id must appear once, found $cnt")
  }

  test("append moves a re-embedded id in ONE generation (atomic: no " +
       "deleted-but-not-reinserted window)") {
    val t = Files.createTempDirectory("graft_vix_").toString + "/idx"
    VectorIndex.publish(embeddings.filter(col("vec_id") < 400), t,
      "vec_id", "embedding", nCells = 16, nShards = 8)
    // negate id 10's vector: its nearest cell — hence shard — changes
    val moved = embeddings.filter(col("vec_id") === 10)
      .withColumn("embedding", transform(col("embedding"), x => -x))
    VectorIndex.append(moved, t, "vec_id", "embedding",
      retainPrevious = true)
    assert(graft.sinks.Sinks.listShardVersions(spark, t).size == 1,
      "a moving append must publish exactly ONE generation")
    val rows = spark.read.parquet(s"$t/data")
      .filter(col("vec_id") === 10).count()
    assert(rows == 1L, s"moved id must live exactly once, found $rows")
    assert(graft.sinks.Sinks.verifyShards(spark, t, "vec_id")
      .filter(!col("ok")).isEmpty)
  }

  test("delete: bloom-routed takedown removes the ids, leaves the " +
       "rest byte-identical, no-ops on absent ids") {
    val t = Files.createTempDirectory("graft_vix_").toString + "/idx"
    VectorIndex.publish(embeddings.filter(col("vec_id") < 400), t,
      "vec_id", "embedding", nCells = 16, nShards = 8)
    val before = spark.read.parquet(s"$t/manifest")
      .select("shard", "n_rows", "content_hash")
      .as[(Long, Long, Long)].collect()
      .map { case (s, n, h) => s -> (n, h) }.toMap
    VectorIndex.delete(spark, t, "vec_id", Seq("7", "42", "987654321"))
    val left = spark.read.parquet(s"$t/data").select("vec_id")
      .as[Long].collect().toSet
    assert(!left.contains(7L) && !left.contains(42L))
    assert(left.size == 398, s"only the two live ids go, got ${left.size}")
    // blast radius: shards holding neither id carry forward unchanged
    val after = spark.read.parquet(s"$t/manifest")
      .select("shard", "n_rows", "content_hash")
      .as[(Long, Long, Long)].collect()
      .map { case (s, n, h) => s -> (n, h) }.toMap
    assert(before.exists { case (s, v) => after.get(s).contains(v) },
      "a 2-id takedown must not rewrite every shard")
    // generation hygiene: an all-absent takedown publishes NOTHING
    val manBefore = spark.read.parquet(s"$t/manifest").collect().toSet
    VectorIndex.delete(spark, t, "vec_id", Seq("111222333", "444555666"))
    assert(spark.read.parquet(s"$t/manifest").collect().toSet == manBefore,
      "absent-id takedown must be a manifest no-op")
    // bounded-planning envelope: oversized id lists refused loudly
    val big = intercept[IllegalArgumentException] {
      VectorIndex.delete(spark, t, "vec_id",
        (0 until 10001).map(_.toString))
    }
    assert(big.getMessage.contains("bounded"))
    assert(graft.sinks.Sinks.verifyShards(spark, t, "vec_id")
      .filter(!col("ok")).isEmpty)
  }

  test("semanticDedup over the index equals semanticDedupFrame over " +
       "the raw corpus with the same centroids") {
    val t = Files.createTempDirectory("graft_vix_").toString + "/idx"
    // plant exact duplicates (ids +1000): cosine 1.0, same cell by
    // construction — the dedup MUST collapse each pair to its low id
    val corpus = embeddings.select("vec_id", "embedding").unionByName(
      embeddings.select((col("vec_id") + 1000L).as("vec_id"),
        col("embedding")))
    VectorIndex.publish(corpus, t, "vec_id", "embedding",
      nCells = 16, nShards = 8)
    val cents = spark.read.parquet(s"$t/centroids")
    val viaIndex = VectorIndex.semanticDedup(spark, t, "vec_id",
        "embedding", threshold = 0.95)
      .filter(col("vec_id") === col("survivor_id"))
      .select("vec_id").as[Long].collect().sorted.toSeq
    val direct = Dedup.semanticDedupFrame(corpus, "embedding",
        "vec_id", spark, cents, "cid", "cv", threshold = 0.95)
      .filter(col("vec_id") === col("survivor_id"))
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(viaIndex == direct,
      "index-backed dedup must keep exactly the survivors the frame " +
        "door keeps")
    assert(viaIndex == (0L until 500L).toSeq,
      "every planted duplicate must collapse to its low id")
  }

  test("stream: micro-batch appends keep the index current; a search " +
       "after the stream sees every arrival") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = Files.createTempDirectory("graft_vix_").toString + "/idx"
    val cp = Files.createTempDirectory("graft_vix_cp_").toString
    VectorIndex.publish(embeddings.filter(col("vec_id") < 300), t,
      "vec_id", "embedding", nCells = 16, nShards = 8)
    val arrivals = embeddings.filter(col("vec_id") >= 300 &&
        col("vec_id") < 320)
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
    val in = MemoryStream[(Long, Array[Float], Int)]
    val q = VectorIndex.stream(spark,
      in.toDF().toDF("vec_id", "embedding", "label"), t,
      "vec_id", "embedding", cp)
    in.addData(arrivals.take(10).toSeq: _*)
    q.processAllAvailable()
    in.addData(arrivals.drop(10).toSeq: _*)
    q.processAllAvailable(); q.stop()
    val ids = spark.read.parquet(s"$t/data").select("vec_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == ((0L until 300L) ++ (300L until 320L)).sorted.toSeq)
    // the maintained index answers searches over streamed vectors
    val got = VectorIndex.topK(spark, t,
      embeddings.filter(col("vec_id") === 310), "vec_id", "embedding",
      k = 3, nProbe = 16)
    val brute = Similarity.bruteForceTopK(
      embeddings.filter(col("vec_id") < 320),
      embeddings.filter(col("vec_id") === 310),
      "embedding", "vec_id", k = 3)
    assert(got.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet ==
      brute.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet)
  }

  test("publish with externally-trained centroids is collect-free and " +
       "rejects sparse centroid ids") {
    val t = Files.createTempDirectory("graft_vix_").toString + "/idx"
    // external frame: 4 dense-id centroids picked from the corpus
    val ext = embeddings.filter(col("vec_id") < 4)
      .select((col("vec_id") % 4).as("cid"),
        col("embedding").cast("array<double>").as("cv"))
    VectorIndex.publish(embeddings, t, "vec_id", "embedding",
      nCells = 4, nShards = 4, centroids = Some(ext))
    val m = spark.read.parquet(s"$t/manifest")
    assert(m.columns.contains("zmin_cell"))
    // every corpus row got a cell in [0, 4)
    val cells = spark.read.parquet(s"$t/data").select("cell")
      .as[Long].collect()
    assert(cells.forall(c => c >= 0 && c < 4))
    val sparse = ext.withColumn("cid", col("cid") * 2)
    val err = intercept[IllegalArgumentException] {
      VectorIndex.publish(embeddings,
        Files.createTempDirectory("graft_vix_").toString + "/idx2",
        "vec_id", "embedding", nCells = 4, nShards = 4,
        centroids = Some(sparse))
    }
    assert(err.getMessage.contains("dense"))
  }
}
