package graft

import org.apache.spark.sql.functions._
import graft.sinks.Sinks
import graft.sources.Sources
import graft.streaming.Pipelines
import java.nio.file.{Files, Paths}

/** Runnable end-to-end streaming demo (and verification surface): drop
  * reference-shaped browse-log JSON into an input dir, run the
  * ODS→DWD pipeline as a file-backed Structured Streaming job with the
  * R2 dual sink (lakehouse parquet + Kafka-shaped frame), print both
  * outputs.
  *
  * Usage: runMain graft.StreamDemo [workDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      Files.createTempDirectory("graft_demo_").toString)
    val inDir = s"$work/in"; Files.createDirectories(Paths.get(inDir))
    // two micro-batch files of reference-shaped browse logs (FIXTURES.md §1)
    Files.writeString(Paths.get(s"$inDir/batch1.json"),
      """{"logtype":"browselog","data":{"logTime":"1655274222161","userId":"uid813665","userIp":"30.121.149.246","obtainPoints":"42","browseProductCode":"demHQ6TADV","browseProductTpCode":"14000","frontProductUrl":"","browseProductUrl":"https://2by/a9UWkE/npF76q"}}
        |{"logtype":"otherlog","data":{"userId":"uid-dropped"}}""".stripMargin)
    Files.writeString(Paths.get(s"$inDir/batch2.json"),
      """{"logtype":"browselog","data":{"logTime":null,"userId":"uid2","userIp":"1.2.3.4","obtainPoints":"7","browseProductCode":"x","browseProductTpCode":"1","frontProductUrl":"","browseProductUrl":"u"}}""".stripMargin)

    val spark = GraftSession.local(4)
    val logs = Sources.jsonFileStream(spark, inDir, Pipelines.userLogSchema)
    val ods = Pipelines.odsBrowseLog(logs, "KAFKA-DWD-BROWSE-LOG-TOPIC")
    val dwd = Pipelines.dwdCleanse(ods,
      requiredCols = Seq("user_id"), tsCols = Seq("log_time"))

    val lake = s"$work/lake/DWD_BROWSELOG"
    val kafkaOut = s"$work/kafka_frame"
    val q = Sinks.dualSink(dwd, s"$work/cp",
      b => b.withColumn("dt", substring(col("log_time"), 1, 10))
        .write.mode("append").partitionBy("dt").parquet(lake),
      b => Sinks.kafkaDynamicTopicFrame(b, "kafka_dwd_topic")
        .write.mode("append").parquet(kafkaOut),
      triggerMs = 200L)
    q.processAllAvailable(); q.stop()

    println("=== DWD_BROWSELOG (lakehouse, partitioned by dt) ===")
    spark.read.parquet(lake).orderBy("user_id").show(10, truncate = false)
    println("=== Kafka frame (topic, value) ===")
    spark.read.parquet(kafkaOut).show(10, truncate = false)
    spark.stop()
  }
}
