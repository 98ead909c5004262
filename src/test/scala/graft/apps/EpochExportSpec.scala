package graft.apps

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.sinks.Sinks

/** [[EpochExport]] — the dataloader artifact: an epoch published as
  * batch-range shards. Pins (a) exact batch membership vs the
  * in-memory assignment, (b) the batch-range read PRUNES to the
  * covering shards only, (c) shard geometry fits [0, nShards) at any
  * corpus size, (d) replica-aware export disperses copies. */
class EpochExportSpec extends SparkTestBase {
  import spark.implicits._

  test("exportEpoch: published batch membership equals epochBatches; " +
    "range read prunes to covering shards; re-export reproduces it") {
    val docs = Tables(spark, sf).documents.select($"doc_id")
    val work = Files.createTempDirectory("graft_eexp_").toString
    val pub = s"$work/epoch0"
    EpochExport.exportEpoch(spark, docs, pub, "doc_id", epoch = 0,
      batchSize = 8, nShards = 4)
    val expect = graft.operators.Batching
      .epochBatches(docs, "doc_id", epoch = 0, batchSize = 8)
      .select("doc_id", "epoch_pos", "batch_id")
      .as[(Long, Long, Long)].collect().toSet
    val full = spark.read.parquet(s"$pub/data")
      .select("doc_id", "epoch_pos", "batch_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(full == expect, "published epoch diverged from the assignment")

    // range read: batches [2, 5] — values exact, and the scan path
    // list covers ONLY shards whose zone range intersects
    val got = Sinks.readShardsBetween(spark, pub, "batch_id", 2L, 5L)
      .select("doc_id", "epoch_pos", "batch_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect.filter(r => r._3 >= 2 && r._3 <= 5))
    val manifest = spark.read.parquet(s"$pub/manifest")
      .select("shard", "zmin_batch_id", "zmax_batch_id")
      .as[(Long, Long, Long)].collect()
    val covering = manifest.filter(m => m._3 >= 2 && m._2 <= 5).map(_._1).toSet
    assert(covering.size < manifest.length,
      "fixture must make pruning visible (some shard outside the range)")
    // the reader's own pruning logic is path-explicit: re-derive it
    // and check it matches the manifest's covering set
    val pruned = Sinks.readShardsBetween(spark, pub, "batch_id", 2L, 5L)
      .queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.map(_.getName).toSeq
      }.flatten
    assert(pruned.nonEmpty && pruned.forall(p =>
      covering.contains(p.stripPrefix("shard=").toLong)),
      s"read must open only covering shards: $pruned vs $covering")

    // determinism: a re-export over a fresh dir publishes the same
    // membership (resumable-training artifact law)
    val pub2 = s"$work/epoch0b"
    EpochExport.exportEpoch(spark, docs, pub2, "doc_id", epoch = 0,
      batchSize = 8, nShards = 4)
    val again = spark.read.parquet(s"$pub2/data")
      .select("doc_id", "epoch_pos", "batch_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == full)
  }

  test("shard geometry fits [0, nShards) at corpus sizes that do not " +
    "divide evenly; replica-aware export disperses copies") {
    val work = Files.createTempDirectory("graft_eexp2_").toString
    // 103 rows, batchSize 4 -> 26 batches, nShards 6 -> perShard 5,
    // max shard id = 25 div 5 = 5 < 6
    val odd = spark.range(103).toDF("doc_id")
    EpochExport.exportEpoch(spark, odd, s"$work/odd", "doc_id",
      epoch = 1, batchSize = 4, nShards = 6)
    val shards = spark.read.parquet(s"$work/odd/manifest")
      .select("shard").as[Long].collect()
    assert(shards.forall(s => s >= 0 && s < 6), s"shard ids ${shards.toSeq}")

    // upsampled corpus: copies of one doc spread across batches
    val up = spark.range(100).toDF("doc_id")
      .withColumn("copy_idx", explode(sequence(lit(0L), lit(3L))))
    EpochExport.exportEpoch(spark, up, s"$work/up", "doc_id",
      epoch = 0, batchSize = 16, nShards = 4, copyIdxCol = "copy_idx")
    val worst = spark.read.parquet(s"$work/up/data")
      .groupBy("doc_id", "batch_id").count()
      .agg(max("count")).head.getLong(0)
    assert(worst <= 2,
      s"a doc landed $worst copies in one exported batch — the " +
        "replica-aware key must disperse them")
  }

  test("exportTail capstone: the UPSAMPLED training tail's exported " +
    "bytes equal the inline assignment row-for-row, the resume read " +
    "prunes and crosses a shard boundary, and replica dispersion " +
    "holds IN the artifact") {
    val docs = Tables(spark, sf).documents
    val work = Files.createTempDirectory("graft_eexp3_").toString
    val pub = s"$work/tail"
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    // alpha 0.15 = aggressive temperature flattening -> rare langs
    // replicate hard (rates >> 1), so copy_idx really exercises the
    // 3-arg key in the exported bytes
    TrainingTail.exportTail(spark, docs, col("lang") === "en",
      k = 400, alpha = 0.15, splits = splits, epoch = 0,
      batchSize = 16, nShards = 4, path = pub)
    val expect = TrainingTail.run(spark, docs, col("lang") === "en",
      k = 400, alpha = 0.15, splits = splits, epoch = 0, batchSize = 16)
      .select("doc_id", "copy_idx", "lang", "epoch_pos", "batch_id")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    val full = spark.read.parquet(s"$pub/data")
      .select("doc_id", "copy_idx", "lang", "epoch_pos", "batch_id")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(full == expect,
      "exported tail diverged from the inline assignment")
    assert(expect.exists(_._2 > 0L),
      "fixture must actually upsample (some copy_idx > 0)")

    // resume read across shard 0's upper boundary (derived from the
    // manifest, so the crossing is guaranteed at any corpus
    // geometry) — values exact, shard-pruned, multi-shard union
    val manifest = spark.read.parquet(s"$pub/manifest")
      .select("shard", "zmin_batch_id", "zmax_batch_id")
      .as[(Long, Long, Long)].collect()
    assert(manifest.length > 2, s"fixture too small: ${manifest.toSeq}")
    val b0max = manifest.find(_._1 == 0L).get._3
    val (lo, hi) = (b0max - 1, b0max + 2)
    val got = Sinks.readShardsBetween(spark, pub, "batch_id", lo, hi)
      .select("doc_id", "copy_idx", "lang", "epoch_pos", "batch_id")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(got == expect.filter(r => r._5 >= lo && r._5 <= hi))
    val covering = manifest.filter(m => m._3 >= lo && m._2 <= hi).map(_._1).toSet
    assert(covering.size > 1, s"range [$lo,$hi] must cross a shard " +
      s"boundary: $covering of ${manifest.toSeq}")
    assert(covering.size < manifest.length,
      "fixture must leave some shard outside the range")

    // replica dispersion IN the bytes: walking the artifact in
    // epoch order, siblings (same doc) are not adjacent beyond the
    // random expectation band — the id-only key would put EVERY
    // sibling adjacent
    val ordered = spark.read.parquet(s"$pub/data")
      .orderBy("epoch_pos").select("doc_id").as[Long].collect()
    val copies = full.size - full.map(_._1).size
    val adjacent = ordered.sliding(2).count(p => p(0) == p(1))
    assert(adjacent.toDouble < math.max(4.0, 0.1 * copies),
      s"adjacent same-doc pairs in the exported epoch: $adjacent " +
        s"over ${ordered.length} rows ($copies replica copies; " +
        "id-only key scores ~all of them)")
  }
}
