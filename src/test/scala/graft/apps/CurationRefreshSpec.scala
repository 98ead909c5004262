package graft.apps

import graft.SparkTestBase
import graft.sinks.Sinks
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The CDC consumption loop: a curated corpus catches up with a base
  * publish by judging only the changed rows, and the result is
  * PROVABLY the full recuration — the equality that makes the
  * incremental path trustworthy at 100 TB, where nobody can afford to
  * check it by running both. */
class CurationRefreshSpec extends SparkTestBase {
  import spark.implicits._

  // row-wise verdict: docs long enough and in a kept language
  private val verdict = col("n") >= 20L && col("lang").isin("en", "de")

  private def v1 = Seq(
    (0L, "keep-a", "en", 30L), (1L, "short", "en", 5L),
    (2L, "keep-b", "de", 40L), (3L, "wrong-lang", "fr", 50L),
    (4L, "keep-c", "en", 25L), (5L, "keep-d", "de", 60L),
    (6L, "borderline", "en", 20L), (7L, "keep-e", "en", 90L),
  ).toDF("id", "text", "lang", "n")

  test("incremental refresh equals full recuration, judging only the " +
       "changed rows") {
    val root = Files.createTempDirectory("graft_refresh_").toString
    val (basePath, curatedPath) = (s"$root/base", s"$root/curated")
    Sinks.writeShards(v1, basePath, "id", 4)
    // initialize the curated corpus = full curation of v1
    Sinks.writeShards(v1.filter(verdict), curatedPath, "id", 4)
    // v2: 1 grows past the gate (insert into curated), 4 shrinks below
    // it (delete from curated), 3 is taken down entirely (was never
    // curated - unmatched delete), 6 gets revised but still passes
    // (update), new docs 100 (passes) and 101 (fails) arrive
    val v2 = v1.filter(col("id") =!= 3L)
      .withColumn("n", when(col("id") === 1L, 35L)
        .when(col("id") === 4L, 10L).otherwise(col("n")))
      .withColumn("text", when(col("id") === 6L, lit("borderline-v2"))
        .otherwise(col("text")))
      .unionByName(Seq((100L, "new-keep", "en", 70L),
        (101L, "new-short", "en", 3L)).toDF("id", "text", "lang", "n"))
    Sinks.publishDelta(v2, basePath, "id", 4, retainPrevious = true)
    val stamp = Sinks.listShardVersions(spark, basePath).head

    val r = CurationRefresh.run(spark, basePath, stamp, curatedPath,
      "id", verdict)
    // judged work = exactly the semantic changes, not the corpus:
    // upserts {1, 6, 100}, drops {4, 101, takedown 3}
    assert(r.upserts == 3 && r.deletes == 3)

    val incremental = spark.read.parquet(s"$curatedPath/data")
      .select("id", "text", "lang", "n")
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    val full = v2.filter(verdict)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(incremental.toSeq == full.toSeq)
    // and the layout stayed verifiable
    assert(Sinks.verifyShards(spark, curatedPath, "id")
      .filter(!col("ok")).isEmpty)
  }

  test("a base takedown propagates to the curated corpus through the " +
       "same loop") {
    val root = Files.createTempDirectory("graft_refresh_").toString
    val (basePath, curatedPath) = (s"$root/base", s"$root/curated")
    Sinks.writeShards(v1, basePath, "id", 4)
    Sinks.writeShards(v1.filter(verdict), curatedPath, "id", 4)
    // GDPR-style: delete doc 2 from the BASE via the takedown door
    Sinks.deleteWhere(spark, basePath, "id", col("id") === 2L,
      retainPrevious = true)
    val stamp = Sinks.listShardVersions(spark, basePath).head
    val r = CurationRefresh.run(spark, basePath, stamp, curatedPath,
      "id", verdict)
    assert(r.upserts == 0 && r.deletes == 1)
    val ids = spark.read.parquet(s"$curatedPath/data")
      .select("id").as[Long].collect().toSet
    assert(!ids.contains(2L) && ids == Set(0L, 4L, 5L, 6L, 7L))
  }
}
