package graft.apps

import graft.SparkTestBase
import graft.sinks.Sinks
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end lakehouse runs of the job-for-job reference equivalents. */
class AppsSpec extends SparkTestBase {
  import spark.implicits._

  private def work(): String = Files.createTempDirectory("graft_apps_").toString

  test("login path: dims -> DWS enrich -> DM serve shape") {
    val w = work()
    // seed dims (what DimUpsert maintains incrementally)
    Sinks.upsertParquet(spark,
      Seq(("uid1", "4", "9371", "30804")).toDF("user_id", "member_level", "member_points", "balance"),
      Layout.dim(w, "DIM_MEMBER_INFO"), "user_id", "member_level")
    Sinks.upsertParquet(spark,
      Seq(("uid1", "Beijing", "Beijing", "CBD")).toDF("user_id", "province", "city", "area"),
      Layout.dim(w, "DIM_MEMBER_ADDRESS"), "user_id", "province")

    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, String, String, String)]
    val logins = in.toDF().toDF("user_id", "ip", "login_tm", "logout_tm")
    val q = DwsLoginEnrich.run(spark, logins, w)
    in.addData(("uid1", "1.2.3.4", "2022-03-08 12:03:06", "2022-03-08 13:36:09"),
      ("uid-miss", "5.6.7.8", "2022-03-08 12:00:00", "2022-03-08 12:30:00"))
    q.processAllAvailable(); q.stop()

    val dws = spark.read.parquet(Layout.dws(w, "USER_LOGIN")).orderBy("user_id")
    val rows = dws.select("user_id", "member_level", "province")
      .as[(String, Option[String], Option[String])].collect()
    assert(rows.toSeq == Seq(
      ("uid-miss", None, None), ("uid1", Some("4"), Some("Beijing"))))
  }

  test("browse path: category self-join enrich -> points batch -> maintenance") {
    val w = work()
    Sinks.upsertParquet(spark,
      Seq(("demHQ6TADV", "汽车玻璃")).toDF("product_id", "product_name"),
      Layout.dim(w, "DIM_PRODUCT_INFO"), "product_id", "product_name")
    Sinks.upsertParquet(spark,
      Seq(("14000", "100", "维修保养"), ("100", "0", "汽车用品"))
        .toDF("id", "p_id", "name"),
      Layout.dim(w, "DIM_PRODUCT_CATEGORY"), "id", "name")

    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, String, String, String, String)]
    val browse = in.toDF().toDF(
      "log_time", "user_id", "browse_product_code", "browse_product_tpcode", "obtain_points")
    val q = DwsBrowseEnrich.run(spark, browse, w)
    in.addData(
      ("2022-06-15 06:23:42", "uid813665", "demHQ6TADV", "14000", "42"),
      ("2022-06-15 07:00:00", "uid813665", "demHQ6TADV", "14000", "8"))
    q.processAllAvailable(); q.stop()

    val wide = spark.read.parquet(Layout.dws(w, "BROWSE_INFO"))
    val r = wide.orderBy("log_time")
      .select("product_name", "first_category_name", "second_category_name")
      .as[(String, String, String)].head()
    assert(r == ("汽车玻璃", "汽车用品", "维修保养"))

    val points = UserPointsBatch.run(spark, w)
      .select("log_time", "user_id", "total_points")
      .as[(String, String, Long)].collect()
    assert(points.toSeq == Seq(("2022-06-15", "uid813665", 50L)))

    val results = MaintenanceJob.run(spark, w, targetBytes = 1L << 30)
    assert(results.nonEmpty && results.forall { case (_, _, after) => after == 1 })
  }
}
