package graft.sinks

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Row-level delete (takedown) and row-level CDC on the shard-layout
  * store — the q92/q93 mechanics the value oracles can't see from the
  * rows alone: blast radius (which shards were rewritten vs carried),
  * generation hygiene (no-op deletes don't churn), audit paths, and
  * the CDC contracts (semantic diff, key uniqueness). */
class DeleteCdcSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus() = Seq(
    (0L, "alpha", "en", 10L), (1L, "beta", "en", 20L),
    (2L, "gamma", "de", 30L), (3L, "delta", "de", 40L),
    (4L, "epsilon", "fr", 50L), (5L, "zeta", "fr", 60L),
    (6L, "eta", "en", 70L), (7L, "theta", "de", 80L),
  ).toDF("id", "text", "lang", "n")

  private def freshLayout(nShards: Int = 4,
                          zoneCols: Seq[String] = Seq("n")): String = {
    val t = Files.createTempDirectory("graft_delspec_").toString + "/c"
    Sinks.writeShards(
      corpus().withColumn("bucket", pmod(col("id"), lit(4L))),
      t, "id", nShards, zoneCols = zoneCols, shardCol = Some("bucket"))
    t
  }

  test("deleteWhere removes exactly the matching rows (NULL pred keeps)") {
    val t = Files.createTempDirectory("graft_delspec_").toString + "/c"
    val df = corpus().withColumn("lang",
      when(col("id") === 5L, lit(null).cast("string"))
        .otherwise(col("lang")))
    Sinks.writeShards(df, t, "id", 4)
    // pred is NULL for id=5 (lang null) — SQL DELETE keeps it
    Sinks.deleteWhere(spark, t, "id", col("lang") === "fr")
    val left = spark.read.parquet(s"$t/data").select("id")
      .as[Long].collect().sorted
    assert(left.toSeq == Seq(0L, 1L, 2L, 3L, 5L, 6L, 7L))
  }

  test("deleteWhere rewrites only shards holding matches; rest carry " +
       "forward with identical manifest rows (hard-linked bytes)") {
    val t = freshLayout()
    val before = spark.read.parquet(s"$t/manifest")
      .select("shard", "n_rows", "content_hash")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val beforeInodes = {
      val d = new java.io.File(s"$t/data/shard=1")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => Files.readAttributes(f.toPath,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey())
        .toSet
    }
    // bucket 2 ⇒ ids 2 and 6 live in shard 2; nothing else matches
    Sinks.deleteWhere(spark, t, "id", col("bucket") === 2L && col("n") < 50L)
    val after = spark.read.parquet(s"$t/manifest")
      .select("shard", "n_rows", "content_hash")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after.keySet == before.keySet)
    Seq(0L, 1L, 3L).foreach(s => assert(after(s) == before(s),
      s"untouched shard $s must carry its manifest row forward"))
    assert(after(2L)._1 == before(2L)._1 - 1 && after(2L) != before(2L))
    // the untouched shard's bytes are the SAME files (hard links),
    // not copies — the zero-data-IO carry the delta publisher uses
    val afterInodes = {
      val d = new java.io.File(s"$t/data/shard=1")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => Files.readAttributes(f.toPath,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey())
        .toSet
    }
    assert(afterInodes == beforeInodes)
    // and the layout still verifies clean end-to-end
    val bad = Sinks.verifyShards(spark, t, "id").filter(!col("ok"))
    assert(bad.isEmpty, bad.collect().mkString("\n"))
  }

  test("deleteWhere with no matches is a NO-OP: same manifest, no " +
       "generation churn") {
    val t = freshLayout()
    val before = spark.read.parquet(s"$t/manifest").collect().toSet
    val out = Sinks.deleteWhere(spark, t, "id", col("n") > 1000L,
      retainPrevious = true)
    assert(out.collect().toSet == before)
    assert(Sinks.listShardVersions(spark, t).isEmpty,
      "a no-op delete must not retire a generation")
  }

  test("deleting every row of a shard drops it from the manifest; " +
       "readers and verify stay consistent") {
    val t = freshLayout()
    Sinks.deleteWhere(spark, t, "id", col("bucket") === 3L)
    val m = spark.read.parquet(s"$t/manifest").select("shard")
      .as[Long].collect().toSet
    assert(m == Set(0L, 1L, 2L))
    assert(spark.read.parquet(s"$t/data").count() == 6)
    val bad = Sinks.verifyShards(spark, t, "id").filter(!col("ok"))
    assert(bad.isEmpty, bad.collect().mkString("\n"))
  }

  test("takedown is auditable: retained generation still answers the " +
       "pre-delete corpus, and readRowChanges enumerates the removals") {
    val t = freshLayout()
    Sinks.deleteWhere(spark, t, "id", col("lang") === "de",
      retainPrevious = true)
    val versions = Sinks.listShardVersions(spark, t)
    assert(versions.size == 1)
    val preDelete = Sinks.readShardsAt(spark, t, versions.head)
      .select("id").as[Long].collect().sorted
    assert(preDelete.toSeq == (0L to 7L))
    val changes = Sinks.readRowChanges(spark, t, versions.head, "id")
      .select("id", "_change_type").as[(Long, String)].collect().sorted
    assert(changes.toSeq ==
      Seq((2L, "delete"), (3L, "delete"), (7L, "delete")))
  }

  test("deleteWhere rejects a nondeterministic predicate") {
    val t = freshLayout()
    val e = intercept[IllegalArgumentException] {
      Sinks.deleteWhere(spark, t, "id", rand() < 0.5)
    }
    assert(e.getMessage.contains("deterministic"))
  }

  test("readRowChanges classifies insert/delete/update and drops rows " +
       "carried unchanged inside rewritten shards") {
    val t = Files.createTempDirectory("graft_cdcspec_").toString + "/c"
    val v1 = corpus()
    // 2 shards: every shard changes, but most rows inside them don't —
    // the diff must be SEMANTIC, not shard-granular
    Sinks.writeShards(v1, t, "id", 2)
    val v2 = v1.filter(col("id") =!= 3L) // delete 3
      .withColumn("text",
        when(col("id") === 4L, lit("epsilon-v2")).otherwise(col("text")))
      .unionByName(Seq((100L, "new-doc", "en", 5L))
        .toDF("id", "text", "lang", "n"))
    Sinks.publishDelta(v2, t, "id", 2, retainPrevious = true)
    val stamp = Sinks.listShardVersions(spark, t).head
    val ch = Sinks.readRowChanges(spark, t, stamp, "id")
    assert(ch.columns.toSeq ==
      Seq("id", "text", "lang", "n", "_change_type"))
    val got = ch.select("id", "text", "_change_type")
      .as[(Long, String, String)].collect().sortBy(r => (r._1, r._3))
    assert(got.toSeq == Seq(
      (3L, "delta", "delete"),
      (4L, "epsilon-v2", "update_postimage"),
      (4L, "epsilon", "update_preimage"),
      (100L, "new-doc", "insert")))
  }

  test("readRowChanges with no changes returns an empty typed frame") {
    val t = Files.createTempDirectory("graft_cdcspec_").toString + "/c"
    val v1 = corpus()
    Sinks.writeShards(v1, t, "id", 2, retainPrevious = true)
    // identical republish: every shard carries forward
    Sinks.publishDelta(v1, t, "id", 2, retainPrevious = true)
    val stamp = Sinks.listShardVersions(spark, t).last
    val ch = Sinks.readRowChanges(spark, t, stamp, "id")
    assert(ch.columns.contains("_change_type"))
    assert(ch.isEmpty)
  }

  test("readRowChanges enforces the unique-id CDC contract") {
    val t = Files.createTempDirectory("graft_cdcspec_").toString + "/c"
    Sinks.writeShards(corpus(), t, "id", 2)
    val dup = corpus().unionByName(
      Seq((0L, "alpha-dup", "en", 11L)).toDF("id", "text", "lang", "n"))
    Sinks.publishDelta(dup, t, "id", 2, retainPrevious = true)
    val stamp = Sinks.listShardVersions(spark, t).head
    val e = intercept[IllegalArgumentException] {
      Sinks.readRowChanges(spark, t, stamp, "id").collect()
    }
    assert(e.getMessage.contains("not unique"))
  }

  test("mergeRows applies upserts + deletes from a patch alone, " +
       "rewriting only the patch's shards") {
    val t = Files.createTempDirectory("graft_mergespec_").toString + "/c"
    Sinks.writeShards(corpus(), t, "id", 4)
    val before = spark.read.parquet(s"$t/manifest")
      .select("shard", "n_rows", "content_hash")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // hash sharding: ids 0..7 land in data-dependent shards; build a
    // patch touching ids 1 (update), 3 (delete), 100 (insert) and
    // derive the EXPECTED untouched set from the same assignment
    val shardOf = corpus().select(col("id"),
      pmod(xxhash64(col("id")), lit(4L)).as("s"))
      .as[(Long, Long)].collect().toMap
    val newShard = spark.range(1).select(
      pmod(xxhash64(lit(100L)), lit(4L))).as[Long].collect().head
    val touched = Set(shardOf(1L), shardOf(3L), newShard)
    val patch = Seq(
      (1L, "beta-v2", "en", 21L, false),
      (3L, "ignored", "de", 0L, true),
      (100L, "brand-new", "fr", 99L, false),
    ).toDF("id", "text", "lang", "n", "_del")
    Sinks.mergeRows(spark, t, patch, "id",
      deleteWhen = Some(col("_del")), retainPrevious = true)
    val rows = spark.read.parquet(s"$t/data")
      .select("id", "text").as[(Long, String)].collect().toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 4L, 5L, 6L, 7L, 100L))
    assert(rows(1L) == "beta-v2" && rows(100L) == "brand-new")
    val after = spark.read.parquet(s"$t/manifest")
      .select("shard", "n_rows", "content_hash")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (before.keySet -- touched).foreach(s => assert(after(s) == before(s),
      s"shard $s held no patched id and must carry forward"))
    // integrity + CDC composition: the retained generation diffs to
    // exactly the merge's semantic changes
    assert(Sinks.verifyShards(spark, t, "id").filter(!col("ok")).isEmpty)
    val stamp = Sinks.listShardVersions(spark, t).head
    val feed = Sinks.readRowChanges(spark, t, stamp, "id")
      .select("id", "_change_type").as[(Long, String)].collect().sorted
    assert(feed.toSeq == Seq((1L, "update_postimage"), (1L, "update_preimage"),
      (3L, "delete"), (100L, "insert")).sortBy(identity))
  }

  test("mergeRows: atomic MOVE — one patch deletes an id at its old " +
       "explicit shard and upserts it at a new one, one generation") {
    val t = freshLayout() // bucket = id mod 4, explicit spec
    // id 2 lives in bucket 2; move it to bucket 0 (a re-keyed row —
    // the VectorIndex re-embedding shape): ONE mergeRows call with a
    // delete row claiming the OLD shard and an upsert claiming the NEW
    val patch = Seq(
      (2L, "gamma", "de", 30L, 2L, true),   // delete at old shard
      (2L, "gamma-v2", "de", 31L, 0L, false), // upsert at new shard
    ).toDF("id", "text", "lang", "n", "bucket", "_del")
    Sinks.mergeRows(spark, t, patch, "id",
      deleteWhen = Some(col("_del")), retainPrevious = true)
    val rows = spark.read.parquet(s"$t/data")
      .filter(col("id") === 2L)
      .select("text", "bucket", "shard")
      .as[(String, Long, Long)].collect()
    assert(rows.toSeq == Seq(("gamma-v2", 0L, 0L)),
      s"moved id must live exactly once, at the new shard: ${rows.toSeq}")
    // atomicity: the move was ONE generation, not delete-then-insert
    assert(Sinks.listShardVersions(spark, t).size == 1,
      "an atomic move must publish exactly one generation")
    assert(Sinks.verifyShards(spark, t, "id").filter(!col("ok")).isEmpty)
    // CDC sees a semantic update, not a delete+insert
    val stamp = Sinks.listShardVersions(spark, t).head
    val feed = Sinks.readRowChanges(spark, t, stamp, "id")
      .select("id", "_change_type").as[(Long, String)].collect().sorted
    assert(feed.toSeq == Seq((2L, "update_postimage"), (2L, "update_preimage")),
      s"a moved id is an UPDATE to the reader: ${feed.toSeq}")
  }

  test("mergeRows: duplicate UPSERT ids still rejected; delete rows may " +
       "repeat an id") {
    val t = freshLayout()
    // two upserts of one id: ambiguous verdict, loud error
    val dupUp = Seq(
      (1L, "a", "en", 1L, 1L, false), (1L, "b", "en", 2L, 1L, false))
      .toDF("id", "text", "lang", "n", "bucket", "_del")
    val e = intercept[IllegalArgumentException] {
      Sinks.mergeRows(spark, t, dupUp, "id", deleteWhen = Some(col("_del")))
    }
    assert(e.getMessage.contains("unique"))
    // two delete rows of one id (bloom false positives can route a
    // takedown to several candidate shards): idempotent, allowed
    val dupDel = Seq(
      (3L, "delta", "de", 40L, 3L, true), (3L, "delta", "de", 40L, 1L, true))
      .toDF("id", "text", "lang", "n", "bucket", "_del")
    Sinks.mergeRows(spark, t, dupDel, "id", deleteWhen = Some(col("_del")))
    assert(spark.read.parquet(s"$t/data")
      .filter(col("id") === 3L).isEmpty, "id 3 must be gone")
    assert(Sinks.verifyShards(spark, t, "id").filter(!col("ok")).isEmpty)
  }

  test("mergeRows: duplicate patch ids rejected; empty patch is a no-op; " +
       "unmatched delete is a no-op") {
    val t = Files.createTempDirectory("graft_mergespec_").toString + "/c"
    Sinks.writeShards(corpus(), t, "id", 4)
    val dup = Seq((1L, "a", "en", 1L), (1L, "b", "en", 2L))
      .toDF("id", "text", "lang", "n")
    val e = intercept[IllegalArgumentException] {
      Sinks.mergeRows(spark, t, dup, "id")
    }
    assert(e.getMessage.contains("unique"))
    val beforeM = spark.read.parquet(s"$t/manifest").collect().toSet
    Sinks.mergeRows(spark, t,
      corpus().filter(lit(false)), "id", retainPrevious = true)
    assert(spark.read.parquet(s"$t/manifest").collect().toSet == beforeM)
    assert(Sinks.listShardVersions(spark, t).isEmpty)
    // deleting an id that was never published: MERGE's unmatched
    // DELETE — no effect on the rows
    Sinks.mergeRows(spark, t,
      Seq((999L, "x", "xx", 0L)).toDF("id", "text", "lang", "n"),
      "id", deleteWhen = Some(lit(true)))
    assert(spark.read.parquet(s"$t/data").count() == 8)
  }

  test("mergeRows on an explicit-assignment layout routes rows via the " +
       "manifest's spec and rejects out-of-range shard values") {
    val t = freshLayout() // bucket = id mod 4, explicit spec
    val patch = Seq((2L, "gamma-v2", "de", 31L, 2L))
      .toDF("id", "text", "lang", "n", "bucket")
    Sinks.mergeRows(spark, t, patch, "id")
    val got = spark.read.parquet(s"$t/data").filter(col("id") === 2L)
      .select("text").as[String].collect()
    assert(got.toSeq == Seq("gamma-v2"))
    val bad = Seq((50L, "oob", "en", 1L, 9L))
      .toDF("id", "text", "lang", "n", "bucket")
    val e = intercept[IllegalArgumentException] {
      Sinks.mergeRows(spark, t, bad, "id")
    }
    assert(e.getMessage.contains("outside"))
    // the failed publish must not have corrupted the layout
    assert(Sinks.verifyShards(spark, t, "id").filter(!col("ok")).isEmpty)
  }

  test("shard_row_changes TVF answers the same feed from pure SQL") {
    val t = Files.createTempDirectory("graft_cdcspec_").toString + "/c"
    Sinks.writeShards(corpus(), t, "id", 2)
    Sinks.publishDelta(corpus().filter(col("id") =!= 5L), t, "id", 2,
      retainPrevious = true)
    val stamp = Sinks.listShardVersions(spark, t).head
    val rows = spark.sql(
      s"SELECT id, _change_type FROM shard_row_changes('$t', '$stamp', 'id')")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((5L, "delete")))
  }
}
