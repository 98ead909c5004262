package graft.apps

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sinks.Sinks
import graft.streaming.{IncrementalDedup, Sessionize}

/** The full 100 TB streaming story in ONE runnable (round-10 stretch):
  * a single event stream — (user_id, ts, doc_id, text), the shape of a
  * crawl/browse feed — fans into the two stateful consumers the engine
  * exists for, and the corpus side publishes a VERSIONED generation
  * chain a loader can time-travel:
  *
  *   1. '''Sessionize''' (T5 keyed state): gap-based sessions per user
  *      via `flatMapGroupsWithState`, upserted into a parquet dim
  *      table keyed on (user, session) — the K6 upsert door, so the
  *      session table itself retains time-travelable generations.
  *   2. '''IncrementalDedup.runChunksPublishing''': chunk each doc,
  *      dedup new-vs-corpus against the persisted band store, and
  *      every `publishEvery` batches flush the survivor set as an
  *      ATOMIC delta generation (only changed shards rewrite; the
  *      rest hard-link). With `retainPrevious` the displaced
  *      generation retires into the publish version store, so
  *      `Sinks.readShardsAt` answers "what did the corpus say before
  *      flush N" — ingest → dedup → publish → readAt, end to end.
  *
  * Layout under `workDir`: `corpus/` (store/pairs/chunks/pub of the
  * dedup pipeline — `pub/_versions/<stamp>` is the generation chain),
  * `sessions/` (the session dim table), `cp_dedup`/`cp_sessions`
  * (checkpoints).
  * AppsSpec drives it over a MemoryStream and asserts the chain. */
object StreamingCuration {

  final case class Handles(dedup: StreamingQuery, sessions: StreamingQuery) {
    def processAllAvailable(): Unit = {
      dedup.processAllAvailable(); sessions.processAllAvailable()
    }
    def stop(): Unit = { dedup.stop(); sessions.stop() }
  }

  /** Wire both consumers over a streaming `events` frame with columns
    * (user_id long, ts long epoch-sec, doc_id long, text string). */
  def run(spark: SparkSession, events: DataFrame, workDir: String,
          gapSec: Long = 1800L, chunkSize: Int = 512, chunkStep: Int = 512,
          numHashes: Int = 64, bands: Int = 16,
          publishEvery: Int = 1, nShards: Int = 16,
          retainPrevious: Boolean = true): Handles = {
    import spark.implicits._
    val dedupQ = IncrementalDedup.runChunksPublishing(spark,
      events.select(col("doc_id"), col("text")),
      s"$workDir/corpus", s"$workDir/cp_dedup",
      size = chunkSize, step = chunkStep,
      numHashes = numHashes, bands = bands,
      publishEvery = publishEvery, nShards = nShards,
      retainPrevious = retainPrevious)
    val sessQ = Sessionize.sessions(spark,
        events.select(col("user_id"), col("ts")).as[(Long, Long)], gapSec)
      .toDF()
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$workDir/cp_sessions")
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        // update-mode emissions re-state the OPEN session each batch;
        // the keyed upsert keeps exactly the latest state per
        // (user, session) — the same latest-wins merge the dim door
        // uses. Versioned by (end_sec, n_events), which is STRICTLY
        // increasing per state emission: two events in the same
        // epoch-second arriving in different micro-batches re-emit
        // with equal end_sec, and on end_sec alone latest-wins would
        // tie-break arbitrarily and could keep the stale lower-count
        // row (round-10 advisory). n_events only grows, so the struct
        // orders every re-emission of one session totally.
        Sinks.upsertParquet(spark,
          b.toDF()
            .withColumn("sk",
              concat(col("user_id"), lit("#"), col("session_id")))
            .withColumn("_ver", struct(col("end_sec"), col("n_events"))),
          s"$workDir/sessions", key = "sk", versionCol = "_ver",
          keepVersionCol = false)
      }
      .start()
    Handles(dedupQ, sessQ)
  }

  /** The corpus generation chain, oldest first (publish stamps). */
  def corpusVersions(spark: SparkSession, workDir: String): Seq[String] =
    Sinks.listShardVersions(spark, s"$workDir/corpus/pub")

  /** Time travel: the published corpus as it stood before `stamp`. */
  def corpusAt(spark: SparkSession, workDir: String, stamp: String): DataFrame =
    Sinks.readShardsAt(spark, s"$workDir/corpus/pub", stamp)

  /** The live published corpus data. */
  def corpus(spark: SparkSession, workDir: String): DataFrame =
    spark.read.parquet(s"$workDir/corpus/pub/data")

  /** The session dim table (latest state per user session). */
  def sessions(spark: SparkSession, workDir: String): DataFrame =
    spark.read.parquet(s"$workDir/sessions")

  /** Runnable file-backed demo (the StreamDemo pattern): drop event
    * JSON into `$work/in`, run both consumers, print the generation
    * chain, a time-traveled generation, and the session table.
    * Usage: runMain graft.apps.StreamingCuration [workDir] */
  def main(args: Array[String]): Unit = {
    import java.nio.file.{Files, Paths}
    val work = args.headOption.getOrElse(
      Files.createTempDirectory("graft_scur_demo_").toString)
    val inDir = s"$work/in"; Files.createDirectories(Paths.get(inDir))
    val shared = "shared boilerplate licence text that repeats verbatim here!"
    def pad(s: String) = (s + " filler words to round out the chunk body")
      .padTo(64, 'x').take(64)
    Files.writeString(Paths.get(s"$inDir/batch1.json"),
      s"""{"user_id":10,"ts":1000,"doc_id":1,"text":"${pad("alpha document opening")}$shared"}
         |{"user_id":20,"ts":2000,"doc_id":2,"text":"${pad("unrelated clean document")}${pad("clean two")}"}""".stripMargin)
    val spark = graft.GraftSession.local(4)
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", LongType),
      StructField("doc_id", LongType), StructField("text", StringType)))
    val events = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    val h = run(spark, events, work, gapSec = 100L,
      chunkSize = 64, chunkStep = 64, numHashes = 32, bands = 8,
      publishEvery = 1, nShards = 8)
    h.processAllAvailable()
    // second batch arrives mid-stream: doc 3 repeats the shared span
    Files.writeString(Paths.get(s"$inDir/batch2.json"),
      s"""{"user_id":10,"ts":1050,"doc_id":3,"text":"${pad("gamma different opening")}$shared"}""")
    h.processAllAvailable(); h.stop()
    println("=== published corpus (live generation) ===")
    corpus(spark, work).select("chunk_id", "doc_id").orderBy("chunk_id")
      .show(20, truncate = false)
    val chain = corpusVersions(spark, work)
    println(s"=== generation chain (oldest first): $chain ===")
    chain.headOption.foreach { stamp =>
      println(s"=== corpusAt($stamp) — before the latest publish ===")
      corpusAt(spark, work, stamp).select("chunk_id").orderBy("chunk_id")
        .show(20, truncate = false)
    }
    println("=== sessions (latest state per user session) ===")
    sessions(spark, work).select("user_id", "session_id", "n_events",
      "start_sec", "end_sec").orderBy("user_id").show(10, truncate = false)
    spark.stop()
  }
}
