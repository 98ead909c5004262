package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Cleanse

/** The reference's layered streaming jobs, re-expressed as single
  * declarative DataFrame chains (works identically on batch and
  * streaming frames — Structured Streaming's incremental planner runs
  * the same logical plan per micro-batch).
  *
  * Where the reference needed three engines' worth of plumbing
  * (SQL → DataStream → SQL boundaries, side-output tags, broadcast
  * process functions, Redis-cached point lookups), each stage here is
  * one transformation whose physical plan Catalyst re-derives per
  * micro-batch: stream-static joins re-scan the dim side every batch
  * (the reference's 5-minute config poll and 24h Redis TTL collapse
  * into that re-scan), and routing is a column, not an operator.
  */
object Pipelines {

  /** Schema of the Maxwell-style CDC envelope on the DB topic
    * (reference DDL ods/ProduceKafkaDBDataToODS.scala:62-80). */
  val cdcSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("ts", StringType),
    StructField("xid", StringType),
    StructField("commit", StringType),
    StructField("data", MapType(StringType, StringType))))

  /** Schema of the user-log topic
    * (reference ods/ProduceKafkaLogDataToODS.scala:47-60). */
  val userLogSchema: StructType = StructType(Seq(
    StructField("logtype", StringType),
    StructField("data", MapType(StringType, StringType))))

  /** ODS stage for CDC data (reference ProduceKafkaDBDataToODS):
    * keep only `sourceDb` rows (P3), left-join the broadcast dim config
    * on (db, table) (J1), classify dim-vs-fact (R1), and attach the
    * routing envelope (P7): target lakehouse table + downstream topic.
    * `config` columns: tbl_db, tbl_name, phoenix_tbl_name, pk_col, cols. */
  def odsRouteCdc(cdc: DataFrame, config: DataFrame, sourceDb: String,
                  factTableFor: Column, factTopicFor: Column): DataFrame =
    cdc.filter(col("database") === sourceDb)
      .join(broadcast(config),
        cdc("database") === config("tbl_db") && cdc("table") === config("tbl_name"),
        "left_outer")
      .withColumn("route",
        when(col("phoenix_tbl_name").isNotNull, lit("dim")).otherwise(lit("fact")))
      .withColumn("iceberg_ods_tbl_name", factTableFor)
      .withColumn("kafka_dwd_topic", factTopicFor)
      .drop("tbl_db", "tbl_name")

  /** ODS stage for user logs (reference ProduceKafkaLogDataToODS):
    * filter logtype (P3), pull typed columns out of the payload map
    * (P1/F9), wrap in the routing envelope (P7). */
  def odsBrowseLog(logs: DataFrame, dwdTopic: String): DataFrame =
    logs.filter(col("logtype") === "browselog")
      .select(
        Cleanse.payload(col("data"), "logTime").as("log_time"),
        Cleanse.payload(col("data"), "userId").as("user_id"),
        Cleanse.payload(col("data"), "userIp").as("user_ip"),
        Cleanse.payload(col("data"), "frontProductUrl").as("front_product_url"),
        Cleanse.payload(col("data"), "browseProductUrl").as("browse_product_url"),
        Cleanse.payload(col("data"), "browseProductTpCode").as("browse_product_tpcode"),
        Cleanse.payload(col("data"), "browseProductCode").as("browse_product_code"),
        Cleanse.payload(col("data"), "obtainPoints").as("obtain_points"))
      .withColumn("iceberg_ods_tbl_name", lit("ODS_BROWSELOG"))
      .withColumn("kafka_dwd_topic", lit(dwdTopic))

  /** DWD cleanse stage (reference ProcessODSDataToDWD): null-guard the
    * required fields (P4) and normalize epoch-millis timestamp strings
    * to formatted datetimes with the 1970 sentinel (P6/F1). */
  def dwdCleanse(ods: DataFrame, requiredCols: Seq[String],
                 tsCols: Seq[String]): DataFrame = {
    val guarded = ods.na.drop(requiredCols)
    tsCols.foldLeft(guarded) { (df, c) =>
      df.withColumn(c, Cleanse.epochMillisToDateTime(col(c)))
    }
  }

  /** DWS enrichment stage (reference ProcessUserlogInToDWS /
    * ProduceBrowseLogToDWS): broadcast stream-static left joins replace
    * Redis-cached Phoenix point lookups; missing dims keep the fact row
    * with null attributes. `dims`: (dimDf, factKey, dimKey). */
  def dwsEnrich(facts: DataFrame, dims: Seq[(DataFrame, String, String)]): DataFrame =
    dims.foldLeft(facts) { case (acc, (dim, fk, dk)) =>
      val d = if (fk == dk) dim else dim.withColumnRenamed(dk, fk)
      acc.join(broadcast(d), Seq(fk), "left_outer")
    }

  /** Watermarked stream-stream inner join: both sides carry event-time
    * watermarks and the join condition bounds the event-time distance,
    * so each side's buffered state is evictable (unbounded state is the
    * failure mode of naive stream-stream joins). The reference never
    * joins two live streams — its enrichments are stream-static — but a
    * lakehouse engine needs this for fact-to-fact correlation (e.g.
    * click ↔ purchase attribution). */
  def streamStreamJoin(left: DataFrame, leftTs: String, right: DataFrame,
                       rightTs: String, key: String, watermark: String,
                       maxDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxDelay"))
      .drop(r(key))
  }

  /** Streaming exact dedup: drop repeats of `keys` arriving within the
    * watermark horizon — a re-arrival with a DIFFERENT timestamp is
    * still a duplicate, so the dedup state is keyed on `keys` alone
    * (`dropDuplicatesWithinWatermark`), evicted once the key's last-seen
    * event time falls behind the watermark. Without the watermark bound,
    * streaming dedup state grows forever. The streaming member of the
    * dedup family (builder brief): batch variants live in
    * `operators.Dedup`. */
  def streamingDedup(df: DataFrame, tsCol: String, keys: Seq[String],
                     watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** DM window stage (reference ProcessBrowseLogInfoToDM:71-96): event
    * -time tumbling window counts with a watermark (the upgrade SURVEY
    * §2.9 T3/T4 prescribes over the reference's processing-time window).
    * Output (append mode) matches ProductVisitInfo:
    * (current_dt, window_start, window_end, keys..., cnt). */
  def dmWindowCounts(facts: DataFrame, tsCol: String, keys: Seq[String],
                     windowSec: Int = 10, watermark: String = "30 seconds"): DataFrame =
    facts
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), s"$windowSec seconds").as("w") +: keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(
        Cleanse.formatDate(col("w.start")).as("current_dt") +:
          Cleanse.formatDateTime(col("w.start")).as("window_start") +:
          Cleanse.formatDateTime(col("w.end")).as("window_end") +:
          keys.map(col) :+ col("cnt"): _*)
}
