package graft.sinks

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** MODEL-BASED property test of the row-level write surface: a seeded
  * random interleaving of merge batches (upserts, deletes, MOVES on an
  * explicit-assignment layout) is replayed against a driver-side
  * `Map[id -> (text, bucket)]` model, and after every batch the
  * published corpus must equal the model exactly — plus the layout
  * integrity check (`verifyShards`) and the uniqueness invariant (one
  * live row per id, whatever shard history it wandered through).
  *
  * This is the test that would have caught the pre-round-13 move
  * hazard (delete-then-reinsert across two generations): any
  * interleaving where an id changes buckets now lands in one atomic
  * generation, and the model compare fails loudly if a row is ever
  * stranded or doubled. */
class MergeModelPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val NBuckets = 4

  test("random merge interleavings (upsert/delete/move) equal the " +
       "driver-side model after every batch") {
    val t = Files.createTempDirectory("graft_mprop_").toString + "/c"
    // seed corpus: ids 0..19 in buckets id % 4
    var model: Map[Long, (String, Long)] =
      (0L until 20L).map(i => i -> (s"v0-$i", i % NBuckets)).toMap
    Sinks.writeShards(
      model.toSeq.map { case (id, (tx, b)) => (id, tx, b) }
        .toDF("id", "text", "bucket"),
      t, "id", NBuckets, shardCol = Some("bucket"))

    val rnd = new scala.util.Random(13L) // fixed seed: reproducible
    for (batch <- 1 to 12) {
      // build a patch: per chosen id, one verdict — upsert (same or
      // MOVED bucket) or delete (at its current bucket if live, or a
      // guessed one if absent — the unmatched-delete no-op)
      val ids = rnd.shuffle((0L until 30L).toVector).take(1 + rnd.nextInt(8))
      var rows = Vector.empty[(Long, String, Long, Boolean)]
      for (id <- ids) {
        val live = model.get(id)
        if (rnd.nextInt(4) == 0) { // delete
          val bucket = live.map(_._2).getOrElse(rnd.nextInt(NBuckets).toLong)
          rows :+= ((id, "tombstone", bucket, true))
          model -= id
        } else { // upsert, possibly moving bucket
          val newBucket = rnd.nextInt(NBuckets).toLong
          val tx = s"v$batch-$id"
          live match {
            case Some((_, oldBucket)) if oldBucket != newBucket =>
              // MOVE: delete row at the old shard + upsert at the new,
              // in the SAME patch (the atomic-move shape)
              rows :+= ((id, "tombstone", oldBucket, true))
              rows :+= ((id, tx, newBucket, false))
            case _ =>
              rows :+= ((id, tx, newBucket, false))
          }
          model += id -> (tx, newBucket)
        }
      }
      Sinks.mergeRows(spark, t,
        rows.toDF("id", "text", "bucket", "_del"), "id",
        deleteWhen = Some(col("_del")))
      // corpus == model, exactly, after EVERY batch
      val got = spark.read.parquet(s"$t/data")
        .select("id", "text", "bucket")
        .as[(Long, String, Long)].collect()
        .map { case (id, tx, b) => id -> (tx, b) }
      assert(got.length == got.map(_._1).distinct.length,
        s"batch $batch: duplicate live ids: ${got.map(_._1).sorted.toSeq}")
      assert(got.toMap == model,
        s"batch $batch: corpus diverged from model — got ${got.toMap}, " +
          s"want $model")
      assert(Sinks.verifyShards(spark, t, "id").filter(!col("ok")).isEmpty,
        s"batch $batch: manifest integrity violated")
    }
  }
}
