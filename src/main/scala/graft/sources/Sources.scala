package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source wrappers — SURVEY §2.1.
  *
  * S1/S2 (Kafka JSON table / raw stream, reference
  * ods/ProduceKafkaDBDataToODS.scala:62-80, utils/MyKafkaUtil.scala:10-13):
  * `readStream.format("kafka")` + `from_json`. The Kafka connector jar is
  * not on this image's classpath, so these wrappers build the exact
  * options but any-file-backed streams (`jsonFileStream`) and
  * `MemoryStream` carry the tested paths; on a cluster with
  * spark-sql-kafka the Kafka variants run unchanged.
  *
  * S3 (JDBC config poll, utils/MySQLUtil.scala:11-65): a `spark.read.jdbc`
  * re-issued per micro-batch inside `foreachBatch` — no sleeping thread.
  *
  * S4 (lakehouse batch scan): `graft.Tables`.
  */
object Sources {

  /** S1: Kafka topic as a streaming DataFrame of parsed JSON columns. */
  def kafkaJsonStream(spark: SparkSession, bootstrap: String, topic: String,
                      schema: StructType,
                      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(from_json(col("value").cast("string"), schema).as("j"))
      .select(col("j.*"))

  /** S2: Kafka topic as raw string values (parse downstream). */
  def kafkaRawStream(spark: SparkSession, bootstrap: String, topic: String,
                     startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast("string").as("value"))

  /** File-backed JSON stream: identical downstream semantics to S1, used
    * by the test harness (each dropped file = a micro-batch of records). */
  def jsonFileStream(spark: SparkSession, path: String,
                     schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** S3: one synchronous read of a JDBC config table (call per batch). */
  def jdbcTable(spark: SparkSession, url: String, table: String,
                props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** S1 wired from deployment config (cluster, offsets policy —
    * reference ConfigUtil.KAFKA_BROKERS / CONSUMER_KAFKA_FROM_EARLIEST,
    * utils/ConfigUtil.scala:18-21). */
  def kafkaJsonStream(spark: SparkSession, cfg: graft.GraftConfig,
                      topic: String, schema: StructType): DataFrame =
    kafkaJsonStream(spark, cfg.kafkaBrokers, topic, schema, cfg.startingOffsets)

  /** S3 wired from deployment config (reference MYSQL_* keys). */
  def jdbcTable(spark: SparkSession, cfg: graft.GraftConfig,
                table: String): DataFrame = {
    val p = new java.util.Properties()
    p.setProperty("user", cfg.jdbcUser)
    p.setProperty("password", cfg.jdbcPassword)
    jdbcTable(spark, cfg.jdbcUrl, table, p)
  }
}
