package graft

import java.util.Properties

/** Typed deployment config — the reference's ConfigUtil surface
  * (utils/ConfigUtil.scala:8-54 over application.conf): connection
  * strings, topic names, dim table names, start-offset policy, all
  * resolved once at startup and referenced by the pipeline apps.
  *
  * Properties-file backed (no external config library on the image):
  * values load from, in precedence order, an explicit file path, the
  * `graft.properties` classpath resource, then built-in defaults that
  * mirror the reference's application.conf shape. Phoenix/HBase/Redis
  * entries have no equivalent here by design — dims are lakehouse
  * tables and broadcast joins replaced the lookup cache (SURVEY §2.1
  * S5/S6). */
final class GraftConfig(props: Properties) {

  private def get(key: String, default: String): String =
    Option(props.getProperty(key)).getOrElse(default)

  /** Tolerant boolean with an error that names the key — a bare
    * .toBoolean would crash construction with a context-free message
    * on e.g. `yes`. */
  private def getBool(key: String, default: Boolean): Boolean =
    get(key, default.toString).trim.toLowerCase match {
      case "true" | "yes" | "1" => true
      case "false" | "no" | "0" => false
      case other => throw new IllegalArgumentException(
        s"config '$key': expected a boolean, got '$other'")
    }

  // relational config/result store (reference mysql.*)
  val jdbcUrl: String = get("jdbc.url", "jdbc:mysql://localhost:3306/lakehousedb")
  val jdbcUser: String = get("jdbc.user", "root")
  val jdbcPassword: String = get("jdbc.password", "")

  // Kafka cluster + topics (reference kafka.*)
  val kafkaBrokers: String = get("kafka.cluster", "localhost:9092")
  val kafkaFromEarliest: Boolean =
    getBool("consumer.kafka.from.earliest", default = true)
  def startingOffsets: String = if (kafkaFromEarliest) "earliest" else "latest"
  val odsTopic: String = get("kafka.ods.topic", "KAFKA-ODS-TOPIC")
  val dimTopic: String = get("kafka.dim.topic", "KAFKA-DIM-TOPIC")
  val dwdUserLogTopic: String =
    get("kafka.dwd.userlog.topic", "KAFKA-DWD-USER-LOGIN-TOPIC")
  val dwdBrowseLogTopic: String =
    get("kafka.dwd.browselog.topic", "KAFKA-DWD-BROWSE-LOG-TOPIC")
  val dwsUserLoginWideTopic: String =
    get("kafka.dws.userlogin.wide.topic", "KAFKA-DWS-USER-LOGIN-WIDE-TOPIC")
  val dwsBrowseLogWideTopic: String =
    get("kafka.dws.browse.log.wide.topic", "KAFKA-DWS-BROWSE-LOG-WIDE-TOPIC")

  // dim table names (reference hbase.dim.* — lakehouse tables here)
  val dimMemberInfo: String = get("dim.member.info", "DIM_MEMBER_INFO")
  val dimMemberAddress: String = get("dim.member.address", "DIM_MEMBER_ADDRESS")
  val dimProductInfo: String = get("dim.product.info", "DIM_PRODUCT_INFO")
  val dimProductCategory: String =
    get("dim.product.category", "DIM_PRODUCT_CATEGORY")

  // serving sink (reference clickhouse.* — any JDBC OLAP store)
  val serveJdbcUrl: String = get("serve.jdbc.url", "jdbc:clickhouse://localhost:8123/default")
  val serveJdbcUser: String = get("serve.jdbc.user", "default")
  val serveJdbcPassword: String = get("serve.jdbc.password", "")

  // lakehouse root + checkpoint root (Spark-side additions)
  val warehouseDir: String = get("warehouse.dir", "/tmp/graft/lake")
  val checkpointDir: String = get("checkpoint.dir", "/tmp/graft/cp")
}

object GraftConfig {

  /** Defaults only. */
  def apply(): GraftConfig = new GraftConfig(new Properties())

  /** Classpath `graft.properties` over defaults (absent resource →
    * defaults, like ConfigFactory.load with no application.conf). */
  def load(): GraftConfig = {
    val props = new Properties()
    val in = getClass.getClassLoader.getResourceAsStream("graft.properties")
    if (in != null) try props.load(in) finally in.close()
    new GraftConfig(props)
  }

  /** Explicit properties file (missing file is an error — a deploy
    * that names a config wants to know it was not read). */
  def fromFile(path: String): GraftConfig = {
    val props = new Properties()
    val in = new java.io.FileInputStream(path)
    try props.load(in) finally in.close()
    new GraftConfig(props)
  }
}
