package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven record routing — SURVEY §2.4 J1 + §2.5 R1/R3.
  *
  * The reference broadcasts a MySQL dim-config table into a
  * `BroadcastProcessFunction` and probes it per CDC record to decide
  * dim-vs-fact and attach sink metadata
  * (ods/ProduceKafkaDBDataToODS.scala:160-217); dims go to a side output
  * (R1), and a routing envelope addresses per-record Iceberg tables and
  * Kafka topics (R3, dwd/ProcessODSDataToDWD.scala:117-138).
  *
  * Spark-first shape: the config is just a small DataFrame; routing is a
  * broadcast left-outer join + a `route` discriminator column. Splitting
  * is two filters over one cached plan — Catalyst pushes each filter to
  * the scan, and no per-record state or side-output machinery exists.
  */
object Routing {

  final case class DimRoute(key: String, dimTable: String)

  /** Attach routing metadata: left-join the broadcast config on `keyCol`;
    * records with a config hit are dims bound for `dim_table`, the rest
    * are facts bound for `factTable`. */
  def routed(records: DataFrame, config: DataFrame, keyCol: String,
             factTable: String): DataFrame =
    records
      .join(broadcast(config), Seq(keyCol), "left_outer")
      .withColumn("route",
        when(col("dim_table").isNotNull, lit("dim")).otherwise(lit("fact")))
      .withColumn("target_table",
        coalesce(col("dim_table"), lit(factTable)))
      .drop("dim_table")

  /** R1: split one routed stream into (dims, facts) without re-reading
    * the source. */
  def split(routedDf: DataFrame): (DataFrame, DataFrame) =
    (routedDf.filter(col("route") === "dim"),
     routedDf.filter(col("route") === "fact"))

  /** Build a config DataFrame from in-code routes (stands in for the
    * reference's MySQL `dim_tbl_config_info` poll, utils/MySQLUtil.scala:22;
    * a JDBC read drops in identically). */
  def configDf(spark: SparkSession, keyCol: String,
               routes: Seq[DimRoute]): DataFrame = {
    import spark.implicits._
    routes.toDF("key", "dim_table").withColumnRenamed("key", keyCol)
  }
}
