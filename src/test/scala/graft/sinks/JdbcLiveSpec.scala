package graft.sinks

import graft.SparkTestBase
import graft.sources.Sources
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.DriverManager
import java.util.Properties

/** LIVE execution of the JDBC source/sink paths (SURVEY §2.1 S3, §2.2
  * K4/K5) against a real relational database — Apache Derby embedded,
  * already on the Spark classpath (and covered by Spark's built-in
  * DerbyDialect). No network, but a genuine JDBC stack end to end:
  * DriverManager, connection pool-per-partition, dialect DDL/DML,
  * type mapping — the layer rounds 3–11 could only exercise as
  * "options built, never executed" for want of a server.
  *
  * Reference analogs: MySQL config poll utils/MySQLUtil.scala:11-65;
  * ClickHouse/MySQL result sinks offlineanls/ProcessUserPoints.scala:52-58.
  *
  * Derby stands in for MySQL/ClickHouse: the graft code under test is
  * url-agnostic (`Sources.jdbcTable`, `Sinks.jdbcBatchSink` take any
  * JDBC url); only the url string differs in production. */
class JdbcLiveSpec extends SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftlive;create=true"

  private def exec(sqls: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try sqls.foreach(st.executeUpdate)
      finally st.close()
    } finally conn.close()
  }

  test("S3 live: jdbcTable polls a real relational config table") {
    exec(
      "CREATE TABLE tbl_config (cfg_key VARCHAR(64), cfg_val VARCHAR(256))",
      "INSERT INTO tbl_config VALUES ('route.dim', 'DIM_MEMBER_INFO')",
      "INSERT INTO tbl_config VALUES ('route.fact', 'ODS_BROWSELOG')")
    val df = Sources.jdbcTable(spark, url, "tbl_config")
    val rows = df.orderBy("CFG_KEY")
      .select("CFG_KEY", "CFG_VAL").as[(String, String)].collect()
    assert(rows.toSeq == Seq(
      ("route.dim", "DIM_MEMBER_INFO"), ("route.fact", "ODS_BROWSELOG")))
  }

  test("S3 live: config-wired overload reaches the same table") {
    val props = new Properties()
    props.setProperty("jdbc.url", url)
    // Derby maps the JDBC user to the default schema; APP is where
    // unqualified tables land
    props.setProperty("jdbc.user", "APP")
    val cfg = new graft.GraftConfig(props)
    val df = Sources.jdbcTable(spark, cfg, "tbl_config")
    assert(df.count() == 2)
  }

  test("K4/K5 live: streaming jdbcBatchSink round-trips through the database") {
    // Spark creates the target table itself (JdbcUtils.createTable via
    // DerbyDialect) — the same auto-DDL the MySQL/ClickHouse paths use.
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val cp = Files.createTempDirectory("graft_jdbc_cp_").toString
    val q = Sinks.jdbcBatchSink(
      in.toDF().toDF("user_id", "points"), url, "tbl_points", cp)
    in.addData(("u1", 10L), ("u2", 20L))
    q.processAllAvailable()
    in.addData(("u1", 5L)) // second micro-batch appends, not replaces
    q.processAllAvailable(); q.stop()
    val back = Sources.jdbcTable(spark, url, "tbl_points")
    assert(back.count() == 3)
    val perUser = back.groupBy("user_id")
      .sum("points").as[(String, Long)].collect().toMap
    assert(perUser == Map("u1" -> 15L, "u2" -> 20L))
  }

  test("K4/K5 live: batch append honors JDBC types both directions") {
    // int/long/double/string/timestamp through dialect type mapping
    val df = Seq(
      (1, 2L, 3.5, "s", java.sql.Timestamp.valueOf("2022-06-15 06:23:42")))
      .toDF("i", "l", "d", "s", "ts")
    df.write.mode("append").jdbc(url, "tbl_types", new Properties())
    val back = Sources.jdbcTable(spark, url, "tbl_types")
      .as[(Int, Long, Double, String, java.sql.Timestamp)].collect()
    assert(back.toSeq == Seq(
      (1, 2L, 3.5, "s", java.sql.Timestamp.valueOf("2022-06-15 06:23:42"))))
  }

  test("S3 live: predicate and projection push into the database query") {
    // Spark's JDBC source pushes filters/column pruning into the SQL it
    // sends — at scale the config poll must not drag the whole table
    exec("CREATE TABLE tbl_wide (k INT, a VARCHAR(8), b VARCHAR(8))",
      "INSERT INTO tbl_wide VALUES (1, 'x', 'y'), (2, 'p', 'q')")
    val df = Sources.jdbcTable(spark, url, "tbl_wide")
      .filter($"K" === 2).select("A")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull"),
      s"expected filter pushdown into JDBC scan:\n$plan")
    assert(df.as[String].collect().toSeq == Seq("p"))
  }
}
