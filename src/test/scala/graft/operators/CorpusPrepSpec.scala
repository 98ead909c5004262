package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Splits / chunking / batching — the dataloader-prep operators added
  * round 7 (q69/q70/q71). */
class CorpusPrepSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf).documents

  test("assignSplit: total cover, engine-portable coin, stable under corpus growth") {
    val out = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    assert(out.count() == docs.count()) // every row labeled
    val labels = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    // replay the salted coin in plain Scala — the label is a pure
    // function of (id, SaltSplit), nothing else
    def coin(id: Long): Long = {
      val x = ((id % 1073741824L) + 1073741824L + Sampling.SaltSplit) %
        1073741824L
      val q = (x * (2L * x + 1L)) % 4294967296L
      ((q % 2147483648L) * 2654435761L) % 4294967296L
    }
    val t1 = math.floor(0.9 * 4294967296.0).toLong
    val t2 = math.floor(0.95 * 4294967296.0).toLong
    labels.foreach { case (id, s) =>
      val expect = if (coin(id) < t1) "train" else if (coin(id) < t2) "val" else "test"
      assert(s == expect, s"doc $id: got $s expected $expect")
    }
    // growth stability: labels on a subset are the subset of labels —
    // membership never reshuffles as the corpus grows
    val sub = Sampling.assignSplit(docs.filter($"doc_id" < 100), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    sub.foreach { case (id, s) => assert(labels(id) == s) }
    // shares land near the fractions (hash uniformity sanity)
    val trainShare = labels.values.count(_ == "train").toDouble / labels.size
    assert(math.abs(trainShare - 0.9) < 0.05, s"train share $trainShare")
  }

  test("assignSplit rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("chunk: ceil(len/step) chunks, exact offsets, overlap and reconstruction") {
    val size = 64
    val step = 48
    val out = Chunking.chunk(docs.filter(length($"text") > 0), "text",
        size, step, keepCols = Seq("doc_id"))
      .select("doc_id", "chunk_idx", "chunk_start", "chunk_text", "chunk_len")
      .as[(Long, Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.nonEmpty)
    out.foreach { case (id, chunks) =>
      val text = texts(id)
      val expectN = (text.length - 1) / step + 1
      assert(chunks.length == expectN, s"doc $id: ${chunks.length} != $expectN chunks")
      chunks.foreach { case (_, idx, start, ct, clen) =>
        assert(start == idx * step)
        assert(ct == text.substring(start.toInt,
          math.min(start.toInt + size, text.length)))
        assert(clen == ct.length.toLong)
      }
      // consecutive full chunks overlap by size-step identical chars
      chunks.sliding(2).foreach { pair =>
        if (pair.length == 2 && pair(0)._4.length == size) {
          val (a, b) = (pair(0)._4, pair(1)._4)
          assert(a.takeRight(size - step) ==
            b.take(math.min(size - step, b.length)))
        }
      }
      // stitching step-prefixes + the full last chunk rebuilds the doc
      val rebuilt = chunks.init.map(_._4.take(step)).mkString + chunks.last._4
      assert(rebuilt == text, s"doc $id: reconstruction mismatch")
    }
  }

  test("chunk: empty text yields no rows; step > size rejected") {
    val df = Seq((1L, ""), (2L, "abc")).toDF("doc_id", "text")
    val out = Chunking.chunk(df, "text", 4, 2, Seq("doc_id"))
      .select("doc_id", "chunk_text").as[(Long, String)].collect()
    assert(out.toSet == Set((2L, "abc"), (2L, "c")))
    intercept[IllegalArgumentException] {
      Chunking.chunk(df, "text", 2, 4, Seq("doc_id"))
    }
  }

  test("chunk/batching reject keepCols colliding with derived columns; " +
    "chunk keeps the text column itself") {
    val df = Seq((1L, "abcdef", 3L)).toDF("doc_id", "text", "Chunk_Text")
    intercept[IllegalArgumentException] {
      Chunking.chunk(df, "text", 4, 2, Seq("doc_id", "Chunk_Text"))
    }
    intercept[IllegalArgumentException] {
      Batching.lengthBucketBatches(df.withColumnRenamed("Chunk_Text", "Bucket"),
        lit(3L), "doc_id", 8, 64, Seq("doc_id", "Bucket"))
    }
    // keeping the source text column alongside the chunks works (the
    // operator references an internal alias, not the caller's name)
    val kept = Chunking.chunk(df.select("doc_id", "text"), "text", 4, 2,
        Seq("doc_id", "text"))
      .select("doc_id", "text", "chunk_text").as[(Long, String, String)]
      .collect().toSet
    assert(kept == Set((1L, "abcdef", "abcd"), (1L, "abcdef", "cdef"),
      (1L, "abcdef", "ef")))
  }

  test("lengthBucketBatches equals the window reference; batches bounded and length-ordered") {
    val d = docs.select($"doc_id", (length($"text") / 10).cast("long").as("toks"))
    val out = Batching.lengthBucketBatches(d, $"toks", "doc_id",
        batchSize = 8, bucketQuantum = 64, keepCols = Seq("doc_id"))
      .select("doc_id", "toks", "bucket", "batch_id")
      .as[(Long, Long, Long, Long)].collect()
    // reference: local sort per bucket
    val ref = d.as[(Long, Long)].collect().toSeq
      .map { case (id, t) => (id, t, ((t + 63) / 64) * 64) }
      .groupBy(_._3).toSeq.flatMap { case (bucket, rows) =>
        rows.sortBy { case (id, t, _) => (-t, id) }.zipWithIndex
          .map { case ((id, t, _), i) => (id, t, bucket, i.toLong / 8) }
      }.toSet
    assert(out.toSet == ref)
    // no batch exceeds batchSize; only the last batch of a bucket is short
    out.groupBy(r => (r._3, r._4)).foreach { case ((b, bid), rows) =>
      assert(rows.length <= 8, s"batch ($b,$bid) has ${rows.length} rows")
    }
  }

  test("epochBatches equals the sort reference: every row's position " +
    "and batch, partition-invariant") {
    val d = docs.select($"doc_id")
    val out = Batching.epochBatches(d, "doc_id", epoch = 1, batchSize = 32)
      .select("doc_id", "epoch_pos", "batch_id")
      .as[(Long, Long, Long)].collect()
    // reference: replay the key in plain Scala, sort locally
    val salt = (Sampling.SaltShuffle + 2654435761L) % 1073741824L
    def key(id: Long): Long = {
      val x = ((id % 1073741824L) + 1073741824L + salt) % 1073741824L
      val q = (x * (2L * x + 1L)) % 4294967296L
      ((q % 2147483648L) * 2654435761L) % 4294967296L
    }
    val ref = d.as[Long].collect().toSeq
      .sortBy(id => (key(id), id)).zipWithIndex
      .map { case (id, i) => (id, i + 1L, i.toLong / 32) }.toSet
    assert(out.toSet == ref)
    // partition-invariance: a 13-way reshuffle assigns identically
    val again = Batching.epochBatches(d.repartition(13), "doc_id",
        epoch = 1, batchSize = 32)
      .select("doc_id", "epoch_pos", "batch_id")
      .as[(Long, Long, Long)].collect()
    assert(again.toSet == ref)
  }

  test("epochBatches with copyIdxCol: replica-aware key, all batches " +
    "full except the last, replicas spread over batches") {
    val d = docs.select($"doc_id").limit(200)
      .withColumn("copy_idx", explode(sequence(lit(0L), lit(3L))))
    val out = Batching.epochBatches(d, "doc_id", epoch = 0,
        batchSize = 16, copyIdxCol = "copy_idx")
      .select("doc_id", "copy_idx", "epoch_pos", "batch_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 800)
    assert(out.map(_._3).toSet == (1L to 800L).toSet,
      "positions are exactly 1..n")
    val sizes = out.groupBy(_._4).view.mapValues(_.length).toMap
    assert(sizes.values.forall(_ == 16), "800/16: every batch full")
    // replica dispersion at batch granularity: no doc puts all 4
    // copies in one batch (the id-only key would put EVERY doc's 4
    // copies in one batch)
    val worst = out.groupBy(r => (r._1, r._4)).view.mapValues(_.length)
      .values.max
    assert(worst <= 2, s"a doc landed $worst copies in one batch")
  }

  test("epochBatches rejects derived-column collisions") {
    intercept[IllegalArgumentException] {
      Batching.epochBatches(docs.withColumnRenamed("text", "epoch_pos"),
        "doc_id", epoch = 0, batchSize = 8,
        keepCols = Seq("epoch_pos"))
    }
  }

  test("mixByTemperature: kept counts track n_d^alpha, the rarest " +
    "domain survives whole, alpha=1 keeps everything, and membership " +
    "is partition-invariant") {
    import spark.implicits._
    // three domains with 10/90/900 rows: alpha=0.5 rates are
    // 1, sqrt(1/9)≈.333, sqrt(1/90)≈.105
    val df = ((0L until 10L).map(i => (i, "rare")) ++
        (100L until 190L).map(i => (i, "mid")) ++
        (1000L until 1900L).map(i => (i, "big")))
      .toDF("id", "dom")
    val kept = Sampling.mixByTemperature(df, "dom", "id", alpha = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val byDom = kept.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byDom("rare") == 10, "the rarest domain must be kept whole")
    // expected kept: mid ~ 90*.333=30, big ~ 900*.105=95 — allow the
    // coin's binomial spread (these are deterministic, the band is
    // for robustness to fixture edits, not randomness)
    assert(byDom("mid") > 15 && byDom("mid") < 45, s"mid: ${byDom("mid")}")
    assert(byDom("big") > 60 && byDom("big") < 135, s"big: ${byDom("big")}")
    val all = Sampling.mixByTemperature(df, "dom", "id", alpha = 1.0)
    assert(all.count() == 1000L, "alpha = 1 is the natural mix")
    val repart = Sampling
      .mixByTemperature(df.repartition(17), "dom", "id", alpha = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(kept.toSet == repart.toSet, "membership must be a pure " +
      "function of (id, domain counts)")
    intercept[IllegalArgumentException] {
      Sampling.mixByTemperature(df, "dom", "id", alpha = 0.0)
    }
  }
}
